"""Rigid-transform helpers (y-axis rotation + translation), NumPy and JAX.

Behavioral twin of the reference transform utilities
(ref: src/monopsr/core/transform_utils.py). The JAX versions are batched
over a leading box axis and jit/vmap friendly (static shapes only).

Convention: tr_mat = R(ry) @ T(t), i.e. translation applied first,
then rotation — matching np_get_tr_mat (ref: transform_utils.py:6-33).
"""

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# NumPy (host-side)
# ---------------------------------------------------------------------------

def np_get_tr_mat(ry, t):
    """(4, 4) transform: translate by t then rotate by ry about y."""
    c, s = np.cos(ry), np.sin(ry)
    rot_mat = np.asarray([
        [c, 0.0, s, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [-s, 0.0, c, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ])
    t_mat = np.asarray([
        [1.0, 0.0, 0.0, t[0]],
        [0.0, 1.0, 0.0, t[1]],
        [0.0, 0.0, 1.0, t[2]],
        [0.0, 0.0, 0.0, 1.0],
    ])
    return rot_mat @ t_mat


def pad_pc(point_cloud):
    """(3, N) -> (4, N) homogeneous point cloud."""
    return np.pad(point_cloud, ((0, 1), (0, 0)), mode='constant',
                  constant_values=1.0)


def pad_points(points):
    """(N, 3) -> (N, 4) homogeneous points."""
    return np.pad(points, ((0, 0), (0, 1)), mode='constant',
                  constant_values=1.0)


def apply_tr_mat_to_points(tr_mat, points):
    """Applies a (4, 4) transform to (N, 3) points; returns (N, 3)."""
    pc_padded = pad_points(points).T
    return (tr_mat @ pc_padded)[0:3].T


def invert_tf(tr_mat):
    """Inverts a rigid (4, 4) transformation matrix."""
    rot_inv = tr_mat[0:3, 0:3].T
    t_inv = -tr_mat[0:3, 3]
    mat_inv = np.zeros((4, 4), np.float32)
    mat_inv[0:3, 0:3] = rot_inv
    mat_inv[0:3, 3] = rot_inv @ t_inv
    mat_inv[3, 3] = 1.0
    return mat_inv


# ---------------------------------------------------------------------------
# JAX (device-side, batched)
# ---------------------------------------------------------------------------

def get_tr_mat_batch(ry, t):
    """Batched (N, 4, 4) transforms: translate by t then rotate by ry.

    Args:
        ry: (N,) rotations about y.
        t: (N, 3) translations.

    Returns:
        tr_mat, rot_mat, t_mat: each (N, 4, 4).
    """
    ry = jnp.reshape(ry, (-1,))
    n = ry.shape[0]
    zeros = jnp.zeros((n,), ry.dtype)
    ones = jnp.ones((n,), ry.dtype)
    c, s = jnp.cos(ry), jnp.sin(ry)

    rot_mat = jnp.stack([
        jnp.stack([c, zeros, s, zeros], axis=1),
        jnp.stack([zeros, ones, zeros, zeros], axis=1),
        jnp.stack([-s, zeros, c, zeros], axis=1),
        jnp.stack([zeros, zeros, zeros, ones], axis=1),
    ], axis=1)

    t_mat = jnp.stack([
        jnp.stack([ones, zeros, zeros, t[:, 0]], axis=1),
        jnp.stack([zeros, ones, zeros, t[:, 1]], axis=1),
        jnp.stack([zeros, zeros, ones, t[:, 2]], axis=1),
        jnp.stack([zeros, zeros, zeros, ones], axis=1),
    ], axis=1)

    return rot_mat @ t_mat, rot_mat, t_mat


def pad_pc_batch(point_cloud):
    """(B, 3, N) -> (B, 4, N) homogeneous point cloud."""
    return jnp.pad(point_cloud, ((0, 0), (0, 1), (0, 0)),
                   constant_values=1.0)


def rotate_y_batch(points, ry):
    """Rotates (N, P, 3) points about the y axis by per-row angles (N,).

    Equivalent to applying R(ry) with no translation, but stays in 3-vector
    form (no homogeneous pad) which XLA fuses better.
    """
    c = jnp.cos(ry)[:, None]
    s = jnp.sin(ry)[:, None]
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    xr = c * x + s * z
    zr = -s * x + c * z
    return jnp.stack([xr, y, zr], axis=-1)
