""">=1024 agents per env — the capability the reference needs multi-block
grids + inter-block barriers for (``env_thread_sync.cu``, CHANGELOG v1.6);
here the agent axis is just a larger array dimension (SURVEY §2.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.env_registrar import env_registrar


@pytest.fixture(scope="module", autouse=True)
def _register():
    register_all_envs()


def test_tag_continuous_1100_agents_steps():
    env_cls = env_registrar.get("TagContinuous", backend="tpu")
    env = env_cls(
        num_taggers=100,
        num_runners=1000,
        grid_length=50.0,
        episode_length=10,
        use_full_observation=False,
        num_other_agents_observed=10,
    )
    engine = EnvEngine(env_obj=env, num_envs=2, seed=0)
    assert engine.n_agents == 1100

    state = {
        k: v
        for k, v in engine.state.items()
        if k not in (Constants.OBSERVATIONS, Constants.ACTIONS)
    }
    actions = jax.random.randint(
        jax.random.PRNGKey(0), (2, 1100, 2), 0, 11, dtype=jnp.int32
    )
    state = jax.jit(engine.step_physics)(state, actions)
    obs = jax.jit(engine.observe)(state)

    assert obs.shape == (2, 1100, env.obs_size)
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(state[Constants.REWARDS])).all()
    assert (np.asarray(state[Constants.TIMESTEP]) == 1).all()


def test_cartpole_100k_replicas_step():
    """100,000 concurrent replicas (reference CHANGELOG v2.7 scale claim)."""
    env_cls = env_registrar.get("ClassicControlCartPoleEnv", backend="tpu")
    engine = EnvEngine(
        env_obj=env_cls(episode_length=10, seed=1), num_envs=100_000, seed=0
    )
    out = engine.step_all_envs(np.ones((100_000, 1), np.int32))
    assert out[Constants.OBSERVATIONS].shape[0] == 100_000
    assert np.isfinite(np.asarray(out[Constants.REWARDS])).all()
