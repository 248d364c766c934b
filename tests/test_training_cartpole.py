"""End-to-end training smoke + learning test (SURVEY §4 layer 5)."""

import os

import numpy as np

from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config


def test_cartpole_a2c_trains_and_learns(tmp_path):
    cfg = load_run_config("single_cartpole")
    cfg["trainer"]["num_envs"] = 20
    cfg["trainer"]["train_batch_size"] = 2000  # T = 100
    cfg["trainer"]["num_episodes"] = 1000  # 100 iterations
    cfg["trainer"]["seed"] = 11
    cfg["env"]["episode_length"] = 200
    cfg["env"]["reset_pool_size"] = 0
    cfg["env"]["seed"] = 5
    cfg["saving"]["metrics_log_freq"] = 50
    cfg["saving"]["model_params_save_freq"] = 10_000

    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )

    # metrics were appended to results.json
    results_file = tmp_path / "results" / "results.json"
    assert results_file.exists()
    lines = results_file.read_text().strip().splitlines()
    assert len(lines) >= 2

    # checkpoint exists and encodes the final timestep
    ckpts = [f for f in os.listdir(tmp_path / "results") if "state_dict" in f]
    assert any(str(trainer.current_timestep) in c for c in ckpts)

    # the policy learned something: argmax eval should hold the pole
    # clearly longer than a random policy (~20 steps)
    rews = trainer.evaluate_episodes(num_episodes=1, use_argmax=True)
    assert rews[0] > 50, f"no learning signal: eval reward {rews}"

    # fetch_episode_states returns a truncated trajectory
    traj = trainer.fetch_episode_states(["state"], include_rewards_actions=True)
    assert traj["state"].ndim == 3 and traj["state"].shape[0] >= 2
    assert np.isfinite(traj["rewards"]).all()

    # ... and can record per-step action probabilities (reference
    # trainer_base.py:756-776)
    traj_p = trainer.fetch_episode_states(
        ["state"], include_rewards_actions=True, include_probabilities=True
    )
    probs = traj_p["probabilities"]["shared"][0]
    assert probs.shape[-1] == 2  # CartPole has 2 actions
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-4)
