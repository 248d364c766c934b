"""EnvEngine gym-style facade semantics (reference ``env_wrapper.py``
reset/step aliases and done-driven soft reset)."""

import numpy as np
import pytest

import jax.numpy as jnp

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.env_registrar import env_registrar


@pytest.fixture(scope="module", autouse=True)
def _register():
    register_all_envs()


def _engine(num_envs=4, ep_len=5):
    env_cls = env_registrar.get("ClassicControlCartPoleEnv", backend="tpu")
    return EnvEngine(
        env_obj=env_cls(episode_length=ep_len, seed=1), num_envs=num_envs, seed=0
    )


def test_reset_step_cycle_and_soft_reset():
    eng = _engine(num_envs=4, ep_len=5)
    obs0 = eng.reset_all_envs()
    assert obs0.shape == (4, 1, 4)

    # run past the horizon: all envs report done at t == ep_len
    for t in range(5):
        out = eng.step_all_envs(np.ones((4, 1), np.int32))
    assert (np.asarray(out[Constants.DONE]) > 0).all()

    # soft reset restores timestep and (snapshot-flagged) state
    eng.reset_only_done_envs()
    assert (np.asarray(eng.state[Constants.TIMESTEP]) == 0).all()
    np.testing.assert_allclose(
        np.asarray(eng.state[Constants.OBSERVATIONS]),
        np.asarray(eng.obs_at_reset())[None].repeat(4, axis=0),
        rtol=1e-6,
    )

    # gym alias
    obs1 = eng.reset()
    np.testing.assert_allclose(obs1, obs0, rtol=1e-6)


def test_split_step_engine_has_pure_fast_path():
    env_cls = env_registrar.get("TagContinuous", backend="tpu")
    env = env_cls(num_taggers=2, num_runners=4, episode_length=6,
                  use_full_observation=False, num_other_agents_observed=2)
    eng = EnvEngine(env_obj=env, num_envs=3, seed=0)
    assert eng.has_split_step
    state = {k: v for k, v in eng.state.items()
             if k not in (Constants.OBSERVATIONS, Constants.ACTIONS)}
    obs = eng.observe(state)
    assert obs.shape == (3, 6, env.obs_size)
    state2 = eng.step_physics(state, jnp.zeros((3, 6, 2), jnp.int32))
    # physics advances time and never writes observations
    assert (np.asarray(state2[Constants.TIMESTEP]) == 1).all()
    assert Constants.OBSERVATIONS not in state2
    # compat step == observe ∘ physics
    full = eng.step(dict(eng.state), jnp.zeros((3, 6, 2), jnp.int32))
    np.testing.assert_allclose(
        np.asarray(full[Constants.OBSERVATIONS]),
        np.asarray(eng.observe(state2)),
        rtol=1e-6,
    )


def test_reset_after_stepping_actually_resets():
    """Regression: the first reset() call used to be a no-op even after
    step_all_envs had advanced the state, returning mid-episode state as
    'reset observations'."""
    import numpy as np

    from warpdrive_tpu.envs import register_all_envs
    from warpdrive_tpu.envs.engine import EnvEngine

    register_all_envs()
    eng = EnvEngine(
        env_name="ClassicControlCartPoleEnv",
        env_config={"episode_length": 50, "reset_pool_size": 0, "seed": 4},
        num_envs=4,
        seed=1,
    )
    for _ in range(3):
        eng.step_all_envs(np.ones((4, 1), dtype=np.int32))
    assert int(np.asarray(eng.state["_timestep_"]).max()) == 3
    eng.reset()
    assert int(np.asarray(eng.state["_timestep_"]).max()) == 0


def test_pool_reset_requires_obs_refresh_path():
    """Regression: reset pools in a mode without the post-reset obs
    refresh (e.g. no observe_fn) must be rejected loudly instead of
    silently serving one step of stale observations per pool reset."""
    import numpy as np
    import pytest

    from warpdrive_tpu.envs.base import TpuEnvironmentContext
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.utils.data_feed import DataFeed
    from warpdrive_tpu.utils.spaces import Discrete

    class PoolNoObserveEnv(TpuEnvironmentContext):
        """Minimal env with a reset pool but NO observe_fn."""

        def __init__(self, episode_length=10, seed=0):
            self.num_agents = 1
            self.episode_length = episode_length
            self.action_space = {0: Discrete(2)}
            self.observation_space = None

        def reset(self):
            return {0: np.zeros(3, dtype=np.float32)}

        def get_data_dictionary(self):
            feed = DataFeed()
            feed.add_data(
                "pos", np.zeros(3, np.float32),
                save_copy_and_apply_at_reset=True,
            )
            return feed

        def get_reset_pool_dictionary(self):
            feed = DataFeed()
            feed.add_pool_for_reset(
                "pos_pool", np.random.rand(5, 3).astype(np.float32), "pos"
            )
            return feed

        def step_fn(self, state):
            return state

    with pytest.raises(NotImplementedError, match="reset pools"):
        EnvEngine(env_obj=PoolNoObserveEnv(), num_envs=2, seed=0)
