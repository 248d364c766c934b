"""End-to-end CLI test in a child process (reference
``tests/wd_training/*/test_env_training.py:56-92`` runs the real training
script the same way)."""

import json
import os
import subprocess
import sys

import yaml


def test_cli_trains_cartpole_in_subprocess(tmp_path):
    cfg = {
        "name": "single_cartpole",
        "env": {"episode_length": 20, "reset_pool_size": 0, "seed": 4},
        "trainer": {
            "num_envs": 4,
            "train_batch_size": 16,
            "num_episodes": 80,
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
            "basedir": str(tmp_path),
            "metrics_log_freq": 2,
            "model_params_save_freq": 10**9,
        },
    }
    cfg_path = tmp_path / "cli_config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    results_dir = tmp_path / "results"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # keep the TPU-plugin sitecustomize out of the child (device-claim spin)
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)

    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "warpdrive_tpu.training.scripts.train",
            "-e",
            str(cfg_path),
            "--results_dir",
            str(results_dir),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        check=False,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]

    lines = (results_dir / "results.json").read_text().strip().splitlines()
    assert lines, "no metrics were written"
    last = json.loads(lines[-1])
    assert last["metrics"]["shared"]["Total loss"] == last["metrics"]["shared"][
        "Total loss"
    ]  # finite (not NaN)
    assert (results_dir / "run_config.json").exists()
