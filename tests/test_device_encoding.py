"""Unit tests for the compact device-input encodings.

prepare_sample ships uint8 image / uint16 depth / uint8 instance image
(monopsr.decode_device_sample upcasts on device); these pin the
losslessness claims and the no-op behavior on already-decoded batches.
"""

import numpy as np

from monopsr_tpu import constants as C
from monopsr_tpu.datasets.kitti import kitti_dataset as kd
from monopsr_tpu.models import monopsr
from monopsr_tpu.train import trainer as trainer_lib


def make_host_sample(h=40, w=64):
    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, (h, w, 3)).astype(np.float32)
    # Depths quantized like the uint16 png source (metres * 256)
    depth = rng.randint(0, 80 * 256, (h, w)).astype(np.float32) / 256.0
    depth[depth < 0.1] = 0.0
    inst = np.full((h, w), 255, np.int32)
    inst[10:20, 10:30] = 3
    return {
        C.SAMPLE_IMAGE_INPUT: image,
        C.SAMPLE_DEPTH_MAP: depth,
        kd.SAMPLE_INSTANCE_IMAGE: inst,
        C.SAMPLE_CAM_P: np.eye(3, 4, dtype=np.float32),
    }


def test_prepare_sample_encodings_lossless():
    sample = make_host_sample()
    out = trainer_lib.prepare_sample(sample, (40, 64))

    assert out['image'].dtype == np.uint8
    assert out[C.SAMPLE_DEPTH_MAP].dtype == np.uint16
    assert out[kd.SAMPLE_INSTANCE_IMAGE].dtype == np.uint8

    decoded = monopsr.decode_device_sample(
        {k: np.asarray(v) for k, v in out.items()})
    # Depth: exact round trip of the png quantization
    np.testing.assert_array_equal(
        np.asarray(decoded[C.SAMPLE_DEPTH_MAP]),
        sample[C.SAMPLE_DEPTH_MAP].astype(np.float32))
    # Instance indices: exact
    np.testing.assert_array_equal(
        np.asarray(decoded[kd.SAMPLE_INSTANCE_IMAGE]),
        sample[kd.SAMPLE_INSTANCE_IMAGE])
    # Image: same-size resize is identity up to the <=0.5 rounding
    assert np.max(np.abs(
        np.asarray(decoded['image'], np.float32) -
        sample[C.SAMPLE_IMAGE_INPUT])) <= 0.5


def test_decode_noop_on_float_batches():
    batch = {'image': np.zeros((4, 4, 3), np.float32),
             C.SAMPLE_DEPTH_MAP: np.ones((4, 4), np.float32),
             kd.SAMPLE_INSTANCE_IMAGE: np.zeros((4, 4), np.int32)}
    decoded = monopsr.decode_device_sample(batch)
    for key in batch:
        assert np.asarray(decoded[key]).dtype == batch[key].dtype


def test_strip_to_net_inputs_drops_gt_only_keys():
    sample = {k: np.zeros(3) for k in monopsr.NET_INPUT_SAMPLE_KEYS}
    sample[C.SAMPLE_DEPTH_MAP] = np.zeros((4, 4))
    sample[kd.SAMPLE_INSTANCE_IMAGE] = np.zeros((4, 4))
    sample[C.SAMPLE_ALPHAS] = np.zeros(3)
    stripped = monopsr.strip_to_net_inputs(sample)
    assert set(stripped) == set(monopsr.NET_INPUT_SAMPLE_KEYS)


def test_slot_truncated_pack_matches_full_pull():
    """pack_outputs_for_host(max_slots=k) == full pull on rows [0:k]
    for every per-box leaf; non-box leaves ride through untouched."""
    num_boxes = 8
    rng = np.random.RandomState(0)
    outputs = {
        C.KEY_INST_XYZ_MAP_LOCAL:
            rng.randn(num_boxes, 6, 6, 3).astype(np.float32),
        C.KEY_VALID_MASK_MAPS:
            rng.randn(num_boxes, 6, 6, 1).astype(np.float32),
        C.KEY_LWH: rng.randn(num_boxes, 3).astype(np.float32),
        C.KEY_CENTROIDS: rng.randn(num_boxes, 3).astype(np.float32),
        # Same-size leading dim that is NOT the box axis cannot be
        # distinguished structurally; scalars/odd shapes must pass through
        'scalar_diag': np.float32(3.5),
    }
    full = monopsr.pack_outputs_for_host(dict(outputs))
    packed = monopsr.pack_outputs_for_host(
        dict(outputs), num_boxes=num_boxes, max_slots=4)
    for key, value in packed.items():
        want = full[key]
        if hasattr(value, 'ndim') and value.ndim >= 1:
            assert value.shape[0] == 4
            np.testing.assert_array_equal(value, np.asarray(want)[:4])
        else:
            np.testing.assert_array_equal(value, want)

    # max_slots >= num_boxes or None: unchanged shapes
    same = monopsr.pack_outputs_for_host(
        dict(outputs), num_boxes=num_boxes, max_slots=num_boxes)
    assert same[C.KEY_LWH].shape[0] == num_boxes


def test_ordered_prefetch_preserves_order_and_raises():
    from monopsr_tpu.utils.prefetch import ordered_prefetch

    got = list(ordered_prefetch(lambda i: i * i, range(50),
                                num_threads=4, prefetch=6))
    assert got == [i * i for i in range(50)]

    def boom(i):
        if i == 7:
            raise ValueError('boom')
        return i

    import pytest
    with pytest.raises(ValueError, match='boom'):
        list(ordered_prefetch(boom, range(20), num_threads=3))
