"""Drawing helpers: images, 2D boxes, projected 3D boxes.

Behavioral twin of the reference visualization utilities
(ref: src/monopsr/visualization/vis_utils.py:1-262). Matplotlib-based;
used by the demos and offline analysis, never on the training path.
"""

import numpy as np

BOX_COLOURS = {
    'Car': 'lime',
    'Pedestrian': 'cyan',
    'Cyclist': 'yellow',
    'Van': 'orange',
    'Truck': 'orange',
    'Person_sitting': 'orange',
    'Tram': 'orange',
    'Misc': 'orange',
    'DontCare': 'grey',
}

# 3D box face index (front, right, back, left), matching the reference's
# corner convention (ref: obj_utils.py:658-677)
FACE_IDX = np.array([[0, 1, 5, 4],
                     [1, 2, 6, 5],
                     [2, 3, 7, 6],
                     [3, 0, 4, 7]])


def create_fig(image, figsize=(16, 5)):
    """Creates a figure with the image filling the axes."""
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(1, figsize=figsize)
    ax.imshow(image)
    ax.axis('off')
    return fig, ax


def draw_box_2d(ax, obj_or_box, colour=None, linewidth=2):
    """Draws a 2D box; accepts an ObjectLabel or [y1, x1, y2, x2]."""
    import matplotlib.patches as patches

    if hasattr(obj_or_box, 'x1'):
        x1, y1 = obj_or_box.x1, obj_or_box.y1
        x2, y2 = obj_or_box.x2, obj_or_box.y2
        colour = colour or BOX_COLOURS.get(obj_or_box.type, 'red')
    else:
        y1, x1, y2, x2 = obj_or_box
        colour = colour or 'red'

    ax.add_patch(patches.Rectangle(
        (x1, y1), x2 - x1, y2 - y1,
        linewidth=linewidth, edgecolor=colour, facecolor='none'))


def draw_obj_as_box_3d(ax, obj_label, cam_p, colour=None, linewidth=1.5):
    """Draws the projected 3D wireframe of an ObjectLabel."""
    from monopsr_tpu.datasets.kitti import obj_utils
    from monopsr_tpu.geometry import boxes as box_geom
    from monopsr_tpu.geometry import projection

    box_3d = obj_utils.object_label_to_box_3d(obj_label)
    corners = box_geom.np_compute_box_3d_corners(box_3d)
    if np.any(corners[2] < 0.1):
        return
    uv = projection.np_project_pc_to_image(corners, cam_p)

    colour = colour or BOX_COLOURS.get(obj_label.type, 'red')
    for face in FACE_IDX:
        xs = uv[0][list(face) + [face[0]]]
        ys = uv[1][list(face) + [face[0]]]
        ax.plot(xs, ys, color=colour, linewidth=linewidth)


def draw_instance_masks(image, instance_img, alpha=0.5):
    """Overlays coloured instance masks on an image; returns the blend."""
    import matplotlib.cm as cm

    out = np.asarray(image, np.float32).copy()
    ids = np.unique(instance_img)
    ids = ids[ids != 255]
    cmap = cm.get_cmap('tab20')
    for idx in ids:
        mask = instance_img == idx
        colour = np.asarray(cmap(int(idx) % 20)[:3]) * 255.0
        out[mask] = (1 - alpha) * out[mask] + alpha * colour
    return out.astype(np.uint8)


def save_fig(fig, path, dpi=100):
    fig.savefig(path, bbox_inches='tight', dpi=dpi)
    import matplotlib.pyplot as plt
    plt.close(fig)
