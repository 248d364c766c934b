"""TagGridWorld end-to-end training (multi-agent shared policy; also the
reset-pool variant) — SURVEY §4 layer 5."""

import numpy as np

from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config


def _small_cfg(name):
    cfg = load_run_config(name)
    cfg["trainer"]["num_envs"] = 10
    cfg["trainer"]["train_batch_size"] = 500  # T = 50
    cfg["trainer"]["num_episodes"] = 500
    cfg["trainer"]["seed"] = 9
    cfg["env"]["episode_length"] = 50
    cfg["saving"]["metrics_log_freq"] = 5
    cfg["saving"]["model_params_save_freq"] = 10_000
    return cfg


def test_tag_gridworld_a2c_trains(tmp_path):
    cfg = _small_cfg("tag_gridworld")
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )
    import json

    lines = (tmp_path / "results" / "results.json").read_text().splitlines()
    metrics = json.loads(lines[-1])["metrics"]["shared"]
    assert np.isfinite(metrics["Total loss"])
    assert np.isfinite(metrics["Mean episodic reward"])

    # eval + trajectory fetch on the multi-agent env
    rew_sum, _ = trainer.evaluate_episodes()
    assert np.isfinite(rew_sum["shared"]).all()
    traj = trainer.fetch_episode_states(["loc_x", "loc_y"])
    assert traj["loc_x"].shape[1] == trainer.engine.n_agents


def test_tag_gridworld_reset_pool_variant_trains(tmp_path):
    cfg = _small_cfg("tag_gridworld_with_reset_pool")
    cfg["env"]["reset_pool_size"] = 20
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )
    # the engine carries a reset pool and training produced finite metrics
    assert trainer.engine.store.pools, "reset pool was not registered"
    import json

    lines = (tmp_path / "results" / "results.json").read_text().splitlines()
    metrics = json.loads(lines[-1])["metrics"]["shared"]
    assert np.isfinite(metrics["Total loss"])
