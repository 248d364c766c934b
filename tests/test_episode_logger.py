"""Dense episode logger semantics (mirrors reference log-controller tests,
``tests/warp_drive/pycuda_tests/test_function_manager.py:71-230``: step ->
log -> verify masks -> fetch)."""

import numpy as np
import pytest

import jax

from warpdrive_tpu.core.episode_log import EpisodeLogger
from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.utils.env_registrar import env_registrar


@pytest.fixture(scope="module", autouse=True)
def _register():
    register_all_envs()


def _engine():
    env_cls = env_registrar.get("TagGridWorld", backend="tpu")
    env = env_cls(num_taggers=4, grid_length=6, episode_length=8, seed=1)
    return EnvEngine(env_obj=env, num_envs=3, seed=0)


def test_log_reset_step_fetch():
    engine = _engine()
    store = engine.store
    assert len(store.log_names) > 0, "TagGridWorld flags arrays for logging"
    logger = EpisodeLogger(store)

    state = dict(engine.state)
    buffers = logger.init_buffers(state, env_id=1)
    assert logger.verify_mask(buffers, last_step=0)

    rng = jax.random.PRNGKey(0)
    for t in range(1, 5):
        rng, k1, k2 = jax.random.split(rng, 3)
        actions = jax.random.randint(k1, (3, engine.n_agents, 1), 0, 5)
        state = engine.step(state, actions)
        buffers = logger.log_step(buffers, state, t, env_id=1)

    assert logger.verify_mask(buffers, last_step=4)
    assert not logger.verify_mask(buffers, last_step=6)

    fetched = logger.fetch(buffers, last_step=4)
    for name in logger.log_names:
        assert fetched[name].shape[0] == 5
        # the logged slice equals the live state at the last step
        np.testing.assert_allclose(
            fetched[name][-1], np.asarray(state[name][1]), rtol=1e-6
        )


def test_log_mask_contiguity_guard():
    engine = _engine()
    logger = EpisodeLogger(engine.store)
    state = dict(engine.state)
    buffers = logger.init_buffers(state, env_id=0)
    # skipping a step breaks contiguity, as the reference's in-kernel assert
    # would (log.cu:20-29)
    buffers = logger.log_step(buffers, state, t=2, env_id=0)
    assert not logger.verify_mask(buffers, last_step=2)
    with pytest.raises(AssertionError):
        logger.fetch(buffers, last_step=2)
