"""CPU vs TPU consistency + training smoke for TagGridWorld."""

import numpy as np

from warpdrive_tpu.envs.tag_gridworld import TagGridWorld, TpuTagGridWorld
from warpdrive_tpu.tools.consistency import EnvironmentCPUvsTPU


def test_tag_gridworld_consistency_full_obs():
    EnvironmentCPUvsTPU(
        cpu_env_class=TagGridWorld,
        tpu_env_class=TpuTagGridWorld,
        env_configs={
            "full_obs": {
                "num_taggers": 4,
                "grid_length": 10,
                "episode_length": 50,
                "seed": 3,
            },
        },
        num_envs=3,
        num_episodes=2,
    ).test_env_reset_and_step(threshold_pct=1.0, seed=31)


def test_tag_gridworld_consistency_partial_obs():
    EnvironmentCPUvsTPU(
        cpu_env_class=TagGridWorld,
        tpu_env_class=TpuTagGridWorld,
        env_configs={
            "partial_obs": {
                "num_taggers": 6,
                "grid_length": 12,
                "episode_length": 40,
                "use_full_observation": False,
                "seed": 3,
            },
        },
        num_envs=3,
        num_episodes=2,
    ).test_env_reset_and_step(threshold_pct=1.0, seed=37)


def test_tag_gridworld_a2c_training_smoke(tmp_path):
    from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
    from warpdrive_tpu.utils.config import load_run_config

    cfg = load_run_config("tag_gridworld")
    cfg["env"].update({"grid_length": 10, "episode_length": 50})
    cfg["trainer"].update(
        {"num_envs": 10, "train_batch_size": 500, "num_episodes": 100, "seed": 7}
    )
    cfg["saving"]["metrics_log_freq"] = 5
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "res")
    )
    assert trainer.iters_completed == trainer.num_iters
    rew_sum, _ = trainer.evaluate_episodes()
    assert np.isfinite(rew_sum["shared"]).all()
