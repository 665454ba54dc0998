"""Per-class (l, w, h) k-means clustering with a text cache.

Behavioral twin of the reference cluster utility
(ref: src/monopsr/core/label_cluster_utils.py:12-248). Not on the main
path (the dataset hardcodes the Car cluster, ref: kitti_dataset.py:111);
used for offline analysis and alternative mean-dimension tables.
"""

import os

import numpy as np

from monopsr_tpu.datasets.kitti import obj_utils


class LabelClusterUtils:

    def __init__(self, dataset, cache_dir=None):
        self.dataset = dataset
        self.cache_dir = cache_dir or os.path.join(
            dataset.dataset_dir, 'label_clusters')

    def _cache_path(self, class_str, num_clusters):
        return os.path.join(
            self.cache_dir, '{}_{}_{}.txt'.format(
                self.dataset.data_split, class_str, num_clusters))

    def collect_dims(self, class_str):
        """Gathers (l, w, h) rows for a class over the dataset split."""
        dims = []
        for sample_name in self.dataset.get_sample_names():
            labels = obj_utils.read_labels(
                self.dataset.kitti_label_dir, sample_name)
            for obj in labels:
                if obj.type == class_str:
                    dims.append([obj.l, obj.w, obj.h])
        return np.asarray(dims, np.float64)

    def get_clusters(self, class_str, num_clusters=1):
        """Returns (clusters (k, 3), std_devs (k, 3)); cached to txt."""
        cache = self._cache_path(class_str, num_clusters)
        if os.path.exists(cache):
            data = np.loadtxt(cache).reshape(2 * num_clusters, 3)
            return data[:num_clusters], data[num_clusters:]

        dims = self.collect_dims(class_str)
        if len(dims) == 0:
            raise ValueError('No labels of class ' + class_str)

        if num_clusters == 1:
            clusters = dims.mean(axis=0, keepdims=True)
            stds = dims.std(axis=0, keepdims=True)
        else:
            from sklearn.cluster import KMeans
            km = KMeans(n_clusters=num_clusters, n_init=10,
                        random_state=0).fit(dims)
            clusters = km.cluster_centers_
            stds = np.stack([
                dims[km.labels_ == i].std(axis=0)
                for i in range(num_clusters)])

        os.makedirs(self.cache_dir, exist_ok=True)
        np.savetxt(cache, np.vstack([clusters, stds]), fmt='%.6f')
        return clusters, stds
