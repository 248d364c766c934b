"""Two-policy (tagger/runner) MultiDiscrete training smoke on TagContinuous."""

import numpy as np

from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config


def test_tag_continuous_two_policy_training(tmp_path):
    cfg = load_run_config("tag_continuous")
    cfg["env"].update(
        {
            "num_taggers": 2,
            "num_runners": 8,
            "episode_length": 40,
            "num_other_agents_observed": 4,
        }
    )
    cfg["trainer"].update(
        {"num_envs": 5, "train_batch_size": 200, "num_episodes": 50, "seed": 3}
    )
    cfg["policy"]["runner"]["model"]["fc_dims"] = [32, 32]
    cfg["policy"]["tagger"]["model"]["fc_dims"] = [32, 32]
    cfg["saving"]["metrics_log_freq"] = 5

    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "res")
    )
    assert trainer.iters_completed == trainer.num_iters == 10
    assert set(trainer.policies) == {"runner", "tagger"}

    # both policies produced finite metrics and separate checkpoints
    import os

    files = os.listdir(tmp_path / "res")
    assert any(f.startswith("runner_") for f in files)
    assert any(f.startswith("tagger_") for f in files)

    rew_sum, step_sum = trainer.evaluate_episodes()
    assert all(np.isfinite(rew_sum[p]).all() for p in rew_sum)
    assert set(rew_sum) == {"runner", "tagger"}

    # PPO variant compiles and runs too
    cfg["policy"]["runner"]["algorithm"] = "PPO"
    cfg["trainer"]["num_episodes"] = 10
    trainer2 = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "res2")
    )
    assert trainer2.iters_completed == trainer2.num_iters
