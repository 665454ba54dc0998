"""Round-trip tests for the packed device->host transfer layer."""

import jax
import jax.numpy as jnp
import numpy as np

from monopsr_tpu.utils import transfer


def make_tree():
    key = jax.random.PRNGKey(0)
    return {
        'f32': jax.random.normal(key, (7, 5)),
        'f16': jax.random.normal(key, (3, 4, 2)).astype(jnp.float16),
        'bf16': jax.random.normal(key, (6,)).astype(jnp.bfloat16),
        'bool': jax.random.normal(key, (9,)) > 0,
        'i32': jnp.arange(11, dtype=jnp.int32) - 5,
        'scalar': jnp.float32(3.25),
        'empty': jnp.zeros((0, 3), jnp.float32),
        'nested': {'a': jnp.ones((2, 2)), 'b': jnp.arange(4)},
    }


def assert_tree_equal(got, want):
    got_l, got_t = jax.tree.flatten(got)
    want_l, want_t = jax.tree.flatten(want)
    assert got_t == want_t
    for g, w in zip(got_l, want_l):
        assert isinstance(g, np.ndarray) or np.isscalar(g)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_packed_matches_device_get():
    tree = make_tree()
    want = jax.device_get(tree)
    got = transfer.device_get_packed(tree)
    assert_tree_equal(got, want)
    # dtypes survive the byte round-trip
    assert got['f16'].dtype == np.float16
    assert str(got['bf16'].dtype) == 'bfloat16'
    assert got['bool'].dtype == np.bool_
    assert got['i32'].dtype == np.int32


def test_mixed_host_and_device_leaves():
    tree = {'host': np.arange(3.0), 'dev': jnp.arange(4.0),
            'pyscalar': 2.5}
    got = transfer.device_get_packed(tree)
    np.testing.assert_array_equal(got['host'], np.arange(3.0))
    np.testing.assert_array_equal(got['dev'], np.arange(4.0))
    assert got['pyscalar'] == 2.5


def test_all_host_tree_is_identity():
    tree = {'a': np.ones(3), 'b': 1.0}
    assert transfer.device_get_packed(tree) is tree


def test_large_tree_chunks():
    # More leaves than one chunk: exercises the chunked path
    tree = {str(i): jnp.full((i % 5 + 1,), i, jnp.float32)
            for i in range(transfer._CHUNK + 10)}
    got = transfer.device_get_packed(tree)
    for i in range(transfer._CHUNK + 10):
        np.testing.assert_array_equal(
            got[str(i)], np.full((i % 5 + 1,), i, np.float32))


def test_packed_state_roundtrip():
    params = {'w': jnp.ones((3, 3)), 'b': jnp.zeros((3,))}
    state = {'params': params,
             'mu': jax.tree.map(jnp.zeros_like, params),
             'step': jnp.int32(7)}
    got = transfer.device_get_packed_state(state, params)
    assert int(got['step']) == 7
    np.testing.assert_array_equal(got['params']['w'], np.ones((3, 3)))
    np.testing.assert_array_equal(got['mu']['b'], np.zeros((3,)))
