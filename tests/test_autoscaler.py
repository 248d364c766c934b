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
    ok, rate = autoscaler._probe(
        cfg, ("ClassicControlCartPoleEnv", "single", "a2c"), timeout_s=600
    )
    assert ok
    # the probe also measures a post-compile rate (throughput-aware scaler)
    assert rate is not None and rate > 0


def test_argfix_forwards_deprecated_kwarg():
    from warpdrive_tpu.utils.argument_fix import Argfix

    @Argfix(old_name="use_cuda", new_name="env_backend")
    def f(env_backend="cpu"):
        return env_backend

    with pytest.warns(DeprecationWarning):
        assert f(use_cuda="tpu") == "tpu"
    assert f(env_backend="x") == "x"


def test_effective_minibatches_divides_envs():
    assert autoscaler._effective_minibatches(100, 8) == 5
    assert autoscaler._effective_minibatches(64, 8) == 8
    assert autoscaler._effective_minibatches(7, 4) == 1
    assert autoscaler._effective_minibatches(2, 8) == 2


def test_memory_knob_ladder_escalation():
    """Beyond-parity: when a size doesn't fit as-configured, the scaler
    escalates remat -> minibatching before giving up, and the selected
    knobs are written into the returned config (divisor-adjusted)."""

    def fake_probe(trial, env_setup):
        envs = trial["trainer"]["num_envs"]
        pol = trial["policy"]["shared"]
        # capacity model: plain fits 16 envs; remat doubles it; each
        # doubling of minibatches doubles it again
        cap = 16
        if pol.get("remat"):
            cap *= 2
        cap *= pol.get("num_minibatches", 1)
        return envs <= cap and trial["trainer"]["train_batch_size"] <= (
            envs * 10 * 2
        )

    cfg = {
        "trainer": {"num_envs": 4, "train_batch_size": 40},
        "env": {},
        "policy": {"shared": {"to_train": True}},
        "saving": {},
    }
    out = autoscaler.perform_auto_vertical_scaling(
        cfg, ("Env", "single", "a2c"), probe_fn=fake_probe
    )
    # remat (x2) + 8 minibatches (x8) -> 256 envs
    assert out["trainer"]["num_envs"] == 256
    assert out["policy"]["shared"]["remat"] is True
    assert out["policy"]["shared"]["num_minibatches"] == 8
    assert out["trainer"]["train_batch_size"] == 256 * 10 * 2
    # input untouched
    assert "remat" not in cfg["policy"]["shared"]


def test_memory_knobs_disabled_matches_plain_search():
    def fake_probe(trial, env_setup):
        pol = trial["policy"]["shared"]
        assert "remat" not in pol  # ladder must not be touched
        return trial["trainer"]["num_envs"] <= 16 and (
            trial["trainer"]["train_batch_size"]
            <= trial["trainer"]["num_envs"] * 10
        )

    cfg = {
        "trainer": {"num_envs": 4, "train_batch_size": 40},
        "env": {},
        "policy": {"shared": {"to_train": True}},
        "saving": {},
    }
    out = autoscaler.perform_auto_vertical_scaling(
        cfg, ("Env", "single", "a2c"), use_memory_knobs=False,
        probe_fn=fake_probe,
    )
    assert out["trainer"]["num_envs"] == 16


def test_throughput_aware_selection():
    """The final config is the highest-THROUGHPUT feasible probe, not the
    size-max: deep storage rungs fit more envs but can train slower
    (measured on-chip: recompute_obs rung 7x slower)."""
    from warpdrive_tpu.tools.autoscaler import perform_auto_vertical_scaling

    def probe(trial, env_setup):
        envs = trial["trainer"]["num_envs"]
        pol = trial["policy"]["p"]
        deep = trial["trainer"].get("update_recompute_obs", False)
        # plain rung fits to 200 envs; the deep rung to 800 — but runs at
        # 1/10 the rate
        if not pol.get("remat"):
            ok = envs <= 200
        elif deep:
            ok = envs <= 800
        else:
            ok = envs <= 200  # intermediate rungs don't help here
        rate = envs * (10.0 if not deep else 1.0)
        return ok, (rate if ok else None)

    cfg = {
        "trainer": {"num_envs": 100, "train_batch_size": 1000,
                    "num_episodes": 500},
        "policy": {"p": {"to_train": True}},
    }
    out = perform_auto_vertical_scaling(cfg, ("dummy",), probe_fn=probe)
    # size-max would be 800 envs on the deep rung (rate 800); the
    # throughput winner is 200 envs on a shallow rung (rate 2000)
    assert out["trainer"]["num_envs"] == 200
    assert not out["trainer"].get("update_recompute_obs", False)
