"""Pool resets verified DEEPLY: post-reset states must be exact pool rows,
the obs placeholder must be refreshed from the pooled state (round-2 bug
fix: it used to restore the fixed snapshot, leaving one step of stale
observations), and lockstep CPU-vs-TPU comparison CONTINUES across pool
resets via the numpy envs' sync_state hook (the reference checker has no
pool handling at all)."""

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.tools.consistency import EnvironmentCPUvsTPU

register_all_envs()


def _run(cpu_cls, tpu_cls, cfg, seed):
    EnvironmentCPUvsTPU(
        cpu_env_class=cpu_cls,
        tpu_env_class=tpu_cls,
        env_configs={"pool": cfg},
        num_envs=4,
        num_episodes=3,
    ).test_env_reset_and_step(threshold_pct=0.1, seed=seed)


def test_cartpole_pool_lockstep():
    from warpdrive_tpu.envs.classic_control.cartpole import (
        ClassicControlCartPoleEnv,
        TpuClassicControlCartPoleEnv,
    )

    _run(
        ClassicControlCartPoleEnv, TpuClassicControlCartPoleEnv,
        {"episode_length": 15, "reset_pool_size": 6, "seed": 3}, 11,
    )


def test_pendulum_pool_lockstep():
    from warpdrive_tpu.envs.classic_control.pendulum import (
        ClassicControlPendulumEnv,
        TpuClassicControlPendulumEnv,
    )

    _run(
        ClassicControlPendulumEnv, TpuClassicControlPendulumEnv,
        {"episode_length": 12, "reset_pool_size": 5, "seed": 4}, 11,
    )


def test_acrobot_pool_lockstep():
    from warpdrive_tpu.envs.classic_control.acrobot import (
        ClassicControlAcrobotEnv,
        TpuClassicControlAcrobotEnv,
    )

    _run(
        ClassicControlAcrobotEnv, TpuClassicControlAcrobotEnv,
        {"episode_length": 12, "reset_pool_size": 5, "seed": 6}, 11,
    )


def test_tag_gridworld_pool_lockstep():
    from warpdrive_tpu.envs.tag_gridworld import (
        TagGridWorld,
        TpuTagGridWorldWithResetPool,
    )

    class CpuPool(TagGridWorld):
        def __init__(self, reset_pool_size=None, **kw):
            super().__init__(**kw)

    _run(
        CpuPool, TpuTagGridWorldWithResetPool,
        {"num_taggers": 3, "grid_length": 6, "episode_length": 12,
         "seed": 5, "reset_pool_size": 4}, 13,
    )
