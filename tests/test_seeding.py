"""Reproducibility: a fixed dataset seed reproduces the sample stream.

The reference draws jitter/oversample/shuffle from the global unseeded
np.random; here dataset_config.seed threads a per-dataset RandomState
through shuffle, oversampling, box jitter, and image noise.
"""

import numpy as np

from monopsr_tpu import constants as C
from monopsr_tpu.datasets.kitti.kitti_dataset import KittiDataset
from tests.test_dataset import make_dataset_config

STREAM_KEYS = (C.SAMPLE_NAME, C.SAMPLE_LABEL_BOXES_2D, C.SAMPLE_ALPHAS)


def _collect_stream(seed, epochs=2, use_image_aug=True):
    cfg = make_dataset_config(seed=seed)
    cfg.aug_config.use_image_aug = use_image_aug
    dataset = KittiDataset(cfg, 'train')
    stream = []
    for _ in range(epochs * dataset.num_samples):
        batch = dataset.next_batch(1, shuffle=True)
        sample = batch[0]
        if sample is None:
            stream.append(None)
            continue
        stream.append({k: np.asarray(sample[k]) if k != C.SAMPLE_NAME
                       else sample[k] for k in STREAM_KEYS}
                      | {'image': np.asarray(sample[C.SAMPLE_IMAGE_INPUT])})
    return stream


def test_same_seed_reproduces_stream():
    a = _collect_stream(seed=123)
    b = _collect_stream(seed=123)
    assert len(a) == len(b)
    for sa, sb in zip(a, b):
        if sa is None or sb is None:
            assert sa is None and sb is None
            continue
        assert sa[C.SAMPLE_NAME] == sb[C.SAMPLE_NAME]
        np.testing.assert_array_equal(sa[C.SAMPLE_LABEL_BOXES_2D],
                                      sb[C.SAMPLE_LABEL_BOXES_2D])
        np.testing.assert_array_equal(sa[C.SAMPLE_ALPHAS],
                                      sb[C.SAMPLE_ALPHAS])
        np.testing.assert_array_equal(sa['image'], sb['image'])


def test_different_seeds_differ():
    a = _collect_stream(seed=123, epochs=1)
    b = _collect_stream(seed=456, epochs=1)
    # Jittered boxes (and likely shuffle order) must differ somewhere
    any_diff = False
    for sa, sb in zip(a, b):
        if sa is None or sb is None:
            any_diff = any_diff or (sa is None) != (sb is None)
            continue
        if sa[C.SAMPLE_NAME] != sb[C.SAMPLE_NAME]:
            any_diff = True
            break
        if not np.array_equal(sa[C.SAMPLE_LABEL_BOXES_2D],
                              sb[C.SAMPLE_LABEL_BOXES_2D]):
            any_diff = True
            break
    assert any_diff


def test_unseeded_default_still_works():
    cfg = make_dataset_config()
    dataset = KittiDataset(cfg, 'train')
    batch = dataset.next_batch(1, shuffle=True)
    assert len(batch) == 1


def test_seeded_draws_are_thread_schedule_independent():
    """Per-sample draws must not depend on get_sample_dict call order.

    The evaluator's producer pool (and any multi-threaded loader)
    interleaves get_sample_dict calls; with a seed set, the draws
    derive from (seed, sample name, epoch), so visiting the samples in
    any order — as a thread pool effectively does — must reproduce
    the serial stream exactly.
    """
    cfg = make_dataset_config(seed=7)
    serial = KittiDataset(cfg, 'train')
    scrambled = KittiDataset(make_dataset_config(seed=7), 'train')

    order = list(range(serial.num_samples))
    a = [serial.get_sample_dict([i])[0] for i in order]
    b_items = {i: scrambled.get_sample_dict([i])[0]
               for i in reversed(order)}
    b = [b_items[i] for i in order]

    for sa, sb in zip(a, b):
        if sa is None or sb is None:
            assert sa is None and sb is None
            continue
        assert sa[C.SAMPLE_NAME] == sb[C.SAMPLE_NAME]
        np.testing.assert_array_equal(sa[C.SAMPLE_LABEL_BOXES_2D],
                                      sb[C.SAMPLE_LABEL_BOXES_2D])
        np.testing.assert_array_equal(
            np.asarray(sa[C.SAMPLE_IMAGE_INPUT]),
            np.asarray(sb[C.SAMPLE_IMAGE_INPUT]))
