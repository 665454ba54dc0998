"""Tests for the batched-pull evaluation pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from monopsr_tpu.eval.pipeline import BatchedPullPipeline


def test_order_and_flush():
    seen = []
    pipe = BatchedPullPipeline(
        lambda sample, out: seen.append((sample, np.asarray(out))),
        pull_batch=3)
    for i in range(7):  # 2 full batches + remainder of 1
        pipe.add(i, jnp.full((2,), i, jnp.float32))
    pipe.close()
    assert [s for s, _ in seen] == list(range(7))
    for i, (_, out) in enumerate(seen):
        np.testing.assert_array_equal(out, np.full((2,), i, np.float32))


def test_pull_time_callback():
    calls = []
    pipe = BatchedPullPipeline(lambda s, o: None, pull_batch=2,
                               on_pull_time=lambda dt, n: calls.append(n))
    for i in range(5):
        pipe.add(i, jnp.zeros(()))
    pipe.close()
    assert calls == [2, 2, 1]


def test_worker_error_propagates():
    def boom(sample, out):
        raise RuntimeError('processing failed')

    pipe = BatchedPullPipeline(boom, pull_batch=1)
    pipe.add(0, jnp.zeros(()))
    with pytest.raises(RuntimeError, match='processing failed'):
        # keep feeding after the failure; close() must not deadlock
        for i in range(1, 10):
            pipe.add(i, jnp.zeros(()))
        pipe.close()


def test_tuple_outputs_roundtrip():
    """Outputs shaped like the evaluator's (outputs, losses, metrics)."""
    got = []
    pipe = BatchedPullPipeline(
        lambda s, out: got.append(out), pull_batch=4)
    step_out = ({'xyz': jnp.ones((2, 3), jnp.float16),
                 'mask': jnp.array([True, False])},
                {'loss': jnp.float32(1.5)},
                {'err': jnp.arange(3.0)})
    pipe.add('s', step_out)
    pipe.close()
    outputs, losses, metrics = got[0]
    assert outputs['xyz'].dtype == np.float16
    assert outputs['mask'].dtype == np.bool_
    assert float(losses['loss']) == 1.5
    np.testing.assert_array_equal(metrics['err'], np.arange(3.0))
