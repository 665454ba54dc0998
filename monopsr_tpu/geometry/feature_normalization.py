"""Per-class mean normalizers for cen_y / cen_z / box height.

Behavioral twin of the reference feature normalization
(ref: src/monopsr/datasets/kitti/feature_normalization.py:4-107), with
the class dispatch done by index lookup instead of tf.case on strings
(strings don't exist on device; the dataset ships per-box class
indices). Mean values in geometry.class_stats with provenance.
"""

import jax.numpy as jnp
import numpy as np

from monopsr_tpu.geometry import class_stats


def _mean_table(mean_dict, classes):
    """(num_classes + 1,) lookup table indexed by 1-based class index."""
    table = [1.0] + [mean_dict[c] for c in classes]
    return np.asarray(table, np.float32)


def normalize_cen_y_by_mean(cen_y, class_indices, classes):
    """Divides (N, 1) cen_y by the per-class mean cen_y."""
    table = jnp.asarray(_mean_table(class_stats.MEAN_CEN_Y, classes))
    means = table[jnp.clip(jnp.reshape(class_indices, (-1,)), 0,
                           len(classes))]
    return cen_y / means[:, None]


def normalize_cen_z_by_mean(cen_z, class_indices, classes):
    """Divides (N, 1) cen_z by the per-class mean cen_z."""
    table = jnp.asarray(_mean_table(class_stats.MEAN_CEN_Z, classes))
    means = table[jnp.clip(jnp.reshape(class_indices, (-1,)), 0,
                           len(classes))]
    return cen_z / means[:, None]


def normalize_box_height_by_mean(box_heights, class_indices, classes):
    """Divides (N, 1) 2D box heights by the per-class mean height."""
    table = jnp.asarray(_mean_table(class_stats.MEAN_BOX_2D_H, classes))
    means = table[jnp.clip(jnp.reshape(class_indices, (-1,)), 0,
                           len(classes))]
    return box_heights / means[:, None]
