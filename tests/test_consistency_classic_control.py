"""CPU-reference vs TPU consistency for all classic-control envs
(reference taxonomy: tests/example_envs/numba_tests/single_agent/classic_control)."""

import pytest

from warpdrive_tpu.tools.consistency import EnvironmentCPUvsTPU
from warpdrive_tpu.envs.classic_control import acrobot as acro
from warpdrive_tpu.envs.classic_control import continuous_mountain_car as cmc
from warpdrive_tpu.envs.classic_control import mountain_car as mc
from warpdrive_tpu.envs.classic_control import pendulum as pend

CASES = [
    (
        "mountain_car",
        mc.ClassicControlMountainCarEnv,
        mc.TpuClassicControlMountainCarEnv,
        {"episode_length": 100, "seed": 9},
    ),
    (
        "continuous_mountain_car",
        cmc.ClassicControlContinuousMountainCarEnv,
        cmc.TpuClassicControlContinuousMountainCarEnv,
        {"episode_length": 100, "seed": 9},
    ),
    (
        "pendulum",
        pend.ClassicControlPendulumEnv,
        pend.TpuClassicControlPendulumEnv,
        {"episode_length": 100, "seed": 9},
    ),
    (
        "acrobot",
        acro.ClassicControlAcrobotEnv,
        acro.TpuClassicControlAcrobotEnv,
        {"episode_length": 100, "seed": 9},
    ),
]


@pytest.mark.parametrize("name,cpu_cls,tpu_cls,config", CASES)
def test_classic_control_consistency(name, cpu_cls, tpu_cls, config):
    EnvironmentCPUvsTPU(
        cpu_env_class=cpu_cls,
        tpu_env_class=tpu_cls,
        env_configs={name: config},
        num_envs=3,
        num_episodes=2,
    ).test_env_reset_and_step(threshold_pct=1.0, seed=23)
