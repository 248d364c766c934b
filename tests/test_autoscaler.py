"""Vertical auto-scaler search logic (reference
``vertical_scaler.py:23-99`` best_param_search semantics)."""

import pytest

from warpdrive_tpu.tools import autoscaler
from warpdrive_tpu.tools.autoscaler import best_param_search


def test_best_param_search_finds_threshold():
    # feasible up to 100: doubling 10->20->40->80->160(fail), bisect 80..160
    calls = []

    def is_valid(n):
        calls.append(n)
        return n <= 100

    assert best_param_search(is_valid, low=10) == 100


def test_best_param_search_exact_power_of_two():
    assert best_param_search(lambda n: n <= 64, low=1) == 64


def test_best_param_search_lower_bound_infeasible():
    with pytest.raises(ValueError):
        best_param_search(lambda n: False, low=4)


def test_perform_auto_vertical_scaling_monkeypatched(monkeypatch):
    """End-to-end search flow with a fake probe: capacity is 64 envs x
    batch_per_env 10, and batches up to 3x at the env cap."""

    def fake_probe(trial, env_setup, timeout_s=0):
        envs = trial["trainer"]["num_envs"]
        batch = trial["trainer"]["train_batch_size"]
        return envs <= 64 and batch <= 64 * 10 * 3

    monkeypatch.setattr(autoscaler, "_probe", fake_probe)
    cfg = {
        "trainer": {"num_envs": 4, "train_batch_size": 40},
        "env": {},
        "saving": {},
    }
    out = autoscaler.perform_auto_vertical_scaling(cfg, ("Env", "single", "a2c"))
    assert out["trainer"]["num_envs"] == 64
    assert out["trainer"]["train_batch_size"] == 64 * 10 * 3
    # input untouched
    assert cfg["trainer"]["num_envs"] == 4


def test_autoscaler_real_subprocess_probe():
    """One real probe subprocess: builds the trainer and runs a full tiny
    iteration on CPU (the same path the OOM search exercises on TPU)."""
    cfg = {
        "name": "single_cartpole",
        "env": {"episode_length": 20, "reset_pool_size": 0, "seed": 1},
        "trainer": {
            "num_envs": 4,
            "train_batch_size": 8,
            "num_episodes": 40,
            "seed": 0,
        },
        "policy": {
            "shared": {
                "to_train": True,
                "algorithm": "A2C",
                "gamma": 0.98,
                "lr": 1e-3,
                "model": {"type": "fully_connected", "fc_dims": [8]},
            }
        },
        "saving": {
            "basedir": "/tmp/wdtpu_probe_test",
            "metrics_log_freq": 10**9,
            "model_params_save_freq": 10**9,
        },
    }
    assert autoscaler._probe(
        cfg, ("ClassicControlCartPoleEnv", "single", "a2c"), timeout_s=600
    )


def test_argfix_forwards_deprecated_kwarg():
    from warpdrive_tpu.utils.argument_fix import Argfix

    @Argfix(old_name="use_cuda", new_name="env_backend")
    def f(env_backend="cpu"):
        return env_backend

    with pytest.warns(DeprecationWarning):
        assert f(use_cuda="tpu") == "tpu"
    assert f(env_backend="x") == "x"
