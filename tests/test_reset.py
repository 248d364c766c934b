"""Direct auto-reset semantics tests (reference
``tests/warp_drive/*/test_env_reset.py`` 1d/2d/3d variants and
``numba_tests/test_pool_reset.py`` distribution check)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpdrive_tpu.core.reset import make_auto_reset_fn
from warpdrive_tpu.utils.constants import Constants

_DONE = Constants.DONE
_TIMESTEP = Constants.TIMESTEP


def _state(num_envs=6):
    """State with 1d/2d/3d float and int arrays (reference rank/dtype
    coverage)."""
    rng = np.random.RandomState(0)
    return {
        _DONE: jnp.asarray([0, 1, 0, 2, 0, 1], jnp.int32),
        _TIMESTEP: jnp.asarray([3, 7, 1, 9, 4, 5], jnp.int32),
        "f1": jnp.asarray(rng.randn(num_envs).astype(np.float32)),
        "f2": jnp.asarray(rng.randn(num_envs, 4).astype(np.float32)),
        "f3": jnp.asarray(rng.randn(num_envs, 3, 2).astype(np.float32)),
        "i2": jnp.asarray(rng.randint(0, 9, (num_envs, 4)).astype(np.int32)),
        "untouched": jnp.asarray(rng.randn(num_envs, 2).astype(np.float32)),
    }


def _snapshot():
    return {
        "f1": jnp.zeros((), jnp.float32) + 100.0,
        "f2": jnp.full((4,), 200.0, jnp.float32),
        "f3": jnp.full((3, 2), 300.0, jnp.float32),
        "i2": jnp.full((4,), 7, jnp.int32),
    }


def test_done_driven_reset_restores_only_done_envs():
    state = _state()
    auto_reset = make_auto_reset_fn(_snapshot(), {})
    out = jax.jit(lambda s, k: auto_reset(s, k))(state, jax.random.PRNGKey(0))

    done_envs = [1, 3, 5]
    running = [0, 2, 4]
    for name, snap_val in [("f1", 100.0), ("f2", 200.0), ("f3", 300.0), ("i2", 7)]:
        arr = np.asarray(out[name])
        orig = np.asarray(state[name])
        for e in done_envs:
            np.testing.assert_allclose(arr[e], snap_val)
        for e in running:
            np.testing.assert_allclose(arr[e], orig[e])
    # unflagged arrays never touched
    np.testing.assert_allclose(
        np.asarray(out["untouched"]), np.asarray(state["untouched"])
    )
    # done flags + timesteps zeroed for done envs only
    # (undo_done_flag_and_reset_timestep, reference reset.cu:65-75)
    assert np.asarray(out[_DONE]).tolist() == [0, 0, 0, 0, 0, 0]
    assert np.asarray(out[_TIMESTEP]).tolist() == [3, 0, 1, 0, 4, 0]


def test_force_reset_restores_everything():
    state = _state()
    auto_reset = make_auto_reset_fn(_snapshot(), {})
    out = jax.jit(lambda s, k: auto_reset(s, k, force=True))(
        state, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(np.asarray(out["f2"]), 200.0)
    assert np.asarray(out[_TIMESTEP]).tolist() == [0] * 6


def test_missing_state_key_is_skipped():
    """Split-step fast path: derived arrays absent from the carry."""
    state = _state()
    del state["f3"]
    auto_reset = make_auto_reset_fn(_snapshot(), {})
    out = auto_reset(state, jax.random.PRNGKey(0))
    assert "f3" not in out


def test_pool_reset_uniform_distribution():
    """Pool rows must be drawn ~uniformly across resets (reference
    ``test_pool_reset.py`` statistical check)."""
    pool_size = 5
    pool = jnp.arange(pool_size, dtype=jnp.float32)[:, None]  # (5, 1)
    num_envs = 2000
    state = {
        _DONE: jnp.ones((num_envs,), jnp.int32),
        _TIMESTEP: jnp.ones((num_envs,), jnp.int32),
        "x": jnp.full((num_envs, 1), -1.0, jnp.float32),
    }
    auto_reset = make_auto_reset_fn({}, {"x": pool})
    out = jax.jit(lambda s, k: auto_reset(s, k))(state, jax.random.PRNGKey(3))
    drawn = np.asarray(out["x"])[:, 0]
    assert set(np.unique(drawn)) <= set(range(pool_size))
    counts = np.bincount(drawn.astype(int), minlength=pool_size)
    expected = num_envs / pool_size
    assert (np.abs(counts - expected) < 4 * np.sqrt(expected)).all(), counts


def test_pool_reset_only_done_envs_draw():
    pool = jnp.asarray([[10.0], [20.0]])
    state = {
        _DONE: jnp.asarray([0, 1], jnp.int32),
        _TIMESTEP: jnp.asarray([2, 2], jnp.int32),
        "x": jnp.asarray([[-1.0], [-1.0]]),
    }
    auto_reset = make_auto_reset_fn({}, {"x": pool})
    out = auto_reset(state, jax.random.PRNGKey(0))
    x = np.asarray(out["x"])
    assert x[0, 0] == -1.0  # running env untouched
    assert x[1, 0] in (10.0, 20.0)
