"""The dispatch-queue sync cadence (round 5, trainer_base.train) is a
pure host-side throttle: blocking on the carry every N iterations must
not change the training trajectory.  (Round-5 finding: on the tunneled
TPU deployment an unbounded async dispatch queue degrades long train()
runs ~3.6x; the default syncs every 50 iterations.)"""

import numpy as np

import jax

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.training.scripts.train import setup_trainer
from warpdrive_tpu.utils.config import load_run_config


def _train_params(sync_freq: int, tmp_path):
    register_all_envs()
    cfg = load_run_config("single_cartpole")
    cfg["trainer"]["num_envs"] = 8
    cfg["trainer"]["train_batch_size"] = 8 * 20
    cfg["trainer"]["num_episodes"] = 8 * 6  # six iterations
    cfg["trainer"]["seed"] = 3
    cfg["trainer"]["dispatch_sync_freq"] = sync_freq
    cfg["env"]["episode_length"] = 20
    cfg["env"]["reset_pool_size"] = 0
    cfg["env"]["seed"] = 5
    cfg["saving"] = {
        "metrics_log_freq": 10**9,
        "model_params_save_freq": 10**9,
        "basedir": str(tmp_path),
        "name": "ds",
        "tag": f"t{sync_freq}",
    }
    tr = setup_trainer(cfg, verbose=False)
    assert tr.dispatch_sync_freq == sync_freq
    tr.train()
    params = jax.tree_util.tree_map(np.asarray, tr._carry["params"])
    tr.graceful_close()
    return params


def test_sync_cadence_does_not_change_trajectory(tmp_path):
    a = _train_params(0, tmp_path)   # never sync (old behavior)
    b = _train_params(2, tmp_path)   # sync every 2 iterations
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
