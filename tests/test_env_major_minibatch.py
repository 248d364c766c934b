"""The env-major minibatch fast path (round 4, trainer_a2c) must be a
pure RELAYOUT: for contiguous (non-shuffled) env-block minibatches, the
update computed by slicing an (E, T, A, F)-transposed obs batch equals
the time-major path up to flatten-order reduction rounding.

The time-major control is forced via the WD_NO_ENV_MAJOR escape hatch
(same trainer code, fast path gated off)."""

import os

import numpy as np
import pytest

import jax

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.training.scripts.train import setup_trainer
from warpdrive_tpu.utils.config import load_run_config


@pytest.fixture(scope="module", autouse=True)
def _register():
    register_all_envs()


def _one_update_params(monkeypatch_env: bool, tmp_path):
    if monkeypatch_env:
        os.environ["WD_NO_ENV_MAJOR"] = "1"
    else:
        os.environ.pop("WD_NO_ENV_MAJOR", None)
    try:
        cfg = load_run_config("single_cartpole")
        cfg["trainer"]["num_envs"] = 8
        cfg["trainer"]["train_batch_size"] = 8 * 20  # T = 20
        cfg["trainer"]["num_episodes"] = 8  # exactly one iteration
        cfg["trainer"]["seed"] = 3
        cfg["env"]["episode_length"] = 20
        cfg["env"]["reset_pool_size"] = 0
        cfg["env"]["seed"] = 5
        cfg["policy"]["shared"]["num_minibatches"] = 4
        cfg["policy"]["shared"]["shuffle_minibatches"] = False
        # pin the fast path ON regardless of the auto-size heuristic
        # (the WD_NO_ENV_MAJOR escape still forces the control OFF)
        cfg["policy"]["shared"]["env_major"] = True
        cfg["saving"] = {
            "metrics_log_freq": 10**9,
            "model_params_save_freq": 10**9,
            "basedir": str(tmp_path),
            "name": "em",
            "tag": "t" + ("_ctl" if monkeypatch_env else "_fast"),
        }
        tr = setup_trainer(cfg, verbose=False)
        tr.train()
        params = jax.tree_util.tree_map(
            np.asarray, tr._carry["params"]
        )
        tr.graceful_close()
        return params
    finally:
        os.environ.pop("WD_NO_ENV_MAJOR", None)


def test_env_major_minibatch_matches_time_major(tmp_path):
    fast = _one_update_params(False, tmp_path)
    ctl = _one_update_params(True, tmp_path)
    flat_f = jax.tree_util.tree_leaves(fast)
    flat_c = jax.tree_util.tree_leaves(ctl)
    assert len(flat_f) == len(flat_c)
    for a, b in zip(flat_f, flat_c):
        np.testing.assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(b, np.float32),
            rtol=2e-4,
            atol=2e-5,
        )
