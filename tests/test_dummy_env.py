"""DummyEnv: minimal plumbing test env (reference test_step.cu parity)."""

import numpy as np

from warpdrive_tpu.envs.dummy_env import DummyEnv, TpuDummyEnv
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.tools.consistency import EnvironmentCPUvsTPU


def test_consistency():
    EnvironmentCPUvsTPU(
        cpu_env_class=DummyEnv,
        tpu_env_class=TpuDummyEnv,
        env_configs={
            "time_done": {"num_agents": 5, "episode_length": 3,
                          "target": 10_000},
            "target_done": {"num_agents": 5, "episode_length": 10,
                            "target": 16},
        },
        num_envs=3,
        num_episodes=2,
    ).test_env_reset_and_step(threshold_pct=0.1, seed=5)


def test_inplace_update_semantics():
    eng = EnvEngine(env_obj=TpuDummyEnv(num_agents=4, episode_length=4,
                                        target=10_000), num_envs=2, seed=0)
    eng.reset_all_envs()
    x0 = np.asarray(eng.state["x"]).copy()
    y0 = np.asarray(eng.state["y"]).copy()
    eng.step_all_envs(np.zeros((2, 4, 1), dtype=np.int32))
    np.testing.assert_allclose(np.asarray(eng.state["x"]), x0 / 2.0)
    np.testing.assert_array_equal(np.asarray(eng.state["y"]), y0 * 2)
