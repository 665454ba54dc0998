"""Offline chamfer distance via KD-tree
(ref: src/monopsr/core/distance_metrics.py:5-23)."""

import numpy as np


def calc_chamfer_dist(points_1, points_2):
    """Symmetric sum of squared NN distances between two (N, 3) clouds."""
    from sklearn.neighbors import KDTree

    tree_1 = KDTree(points_1)
    tree_2 = KDTree(points_2)
    dists_12, _ = tree_2.query(points_1)
    dists_21, _ = tree_1.query(points_2)
    return float(np.sum(dists_12 ** 2) + np.sum(dists_21 ** 2))
