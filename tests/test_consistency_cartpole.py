"""CPU-reference vs TPU-engine consistency for CartPole (SURVEY §4 layer 3)."""

import numpy as np

from warpdrive_tpu.envs.classic_control.cartpole import (
    ClassicControlCartPoleEnv,
    TpuClassicControlCartPoleEnv,
)
from warpdrive_tpu.tools.consistency import EnvironmentCPUvsTPU


def test_cartpole_cpu_vs_tpu_consistency():
    EnvironmentCPUvsTPU(
        cpu_env_class=ClassicControlCartPoleEnv,
        tpu_env_class=TpuClassicControlCartPoleEnv,
        env_configs={
            "fixed_reset": {"episode_length": 100, "seed": 5},
        },
        num_envs=3,
        num_episodes=2,
    ).test_env_reset_and_step(threshold_pct=1.0, seed=17)


def test_cartpole_engine_auto_reset_restores_snapshot():
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.utils.constants import Constants

    env = TpuClassicControlCartPoleEnv(episode_length=10, seed=3)
    engine = EnvEngine(env_obj=env, num_envs=4, seed=0)
    obs0 = engine.reset_all_envs()
    for _ in range(10):
        actions = np.ones((4, 1, 1), dtype=np.int32)
        out = engine.step_all_envs(actions)
    assert (np.asarray(out[Constants.DONE]) > 0).all()
    engine.reset_only_done_envs()
    assert (np.asarray(engine.state[Constants.TIMESTEP]) == 0).all()
    assert (np.asarray(engine.state[Constants.DONE]) == 0).all()
    np.testing.assert_allclose(
        np.asarray(engine.state[Constants.OBSERVATIONS]), obs0, rtol=1e-6
    )


def test_cartpole_reset_pool_sampling():
    """Pool-backed resets draw varied initial states (reference pool reset,
    numba_function_manager.py:430-476)."""
    from warpdrive_tpu.envs.engine import EnvEngine

    env = TpuClassicControlCartPoleEnv(episode_length=5, seed=3, reset_pool_size=20)
    engine = EnvEngine(env_obj=env, num_envs=32, seed=0)
    engine.reset_all_envs()
    for _ in range(5):
        out = engine.step_all_envs(np.ones((32, 1, 1), dtype=np.int32))
    engine.reset_only_done_envs()
    states = np.asarray(engine.state["state"])[:, 0, :]
    # with 32 envs drawing from a 20-state pool, we expect several distinct rows
    assert len(np.unique(states.round(6), axis=0)) > 3
