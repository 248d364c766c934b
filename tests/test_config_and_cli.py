"""Config system + CLI surface tests (reference config merge semantics,
``trainer_base.py:129-156`` / ``run_configs``)."""

import os

import pytest

from warpdrive_tpu.training.scripts.train import _ENV_SETUPS, build_policy_map
from warpdrive_tpu.utils.config import (
    load_run_config,
    recursive_merge_config_dicts,
)


def test_recursive_merge_fills_missing_and_recurses():
    default = {"a": 1, "b": {"c": 2, "d": 3}, "e": [1, 2]}
    cfg = {"b": {"c": 9}}
    merged = recursive_merge_config_dicts(cfg, default)
    assert merged == {"a": 1, "b": {"c": 9, "d": 3}, "e": [1, 2]}
    # inputs untouched
    assert cfg == {"b": {"c": 9}}


def test_every_env_setup_has_a_run_config():
    for name in _ENV_SETUPS:
        cfg = load_run_config(name)
        assert cfg["name"] == name
        assert cfg["trainer"]["num_envs"] > 0
        assert cfg["policy"], f"{name}: no policy section"
        for tag, p in cfg["policy"].items():
            assert "algorithm" in p and "model" in p, (name, tag)


def test_policy_defaults_are_merged_per_policy():
    cfg = load_run_config("tag_continuous")
    for tag in ("runner", "tagger"):
        # defaults filled in even though the yaml omits them
        assert "clip_param" in cfg["policy"][tag]
        assert cfg["policy"][tag]["to_train"] is True


def test_unknown_config_raises():
    with pytest.raises(FileNotFoundError):
        load_run_config("no_such_env_config")


def test_build_policy_map_tag_continuous():
    from warpdrive_tpu.envs import register_all_envs
    from warpdrive_tpu.utils.env_registrar import env_registrar

    register_all_envs()
    env_cls = env_registrar.get("TagContinuous", backend="tpu")
    env = env_cls(num_taggers=3, num_runners=7)
    pm = build_policy_map("tag_continuous", env)
    assert len(pm["tagger"]) == 3 and len(pm["runner"]) == 7
    assert set(pm["tagger"]) | set(pm["runner"]) == set(range(10))
