"""Acrobot A2C with the honest evaluator.
Run: python artifacts/round2/run_acrobot.py"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config

cfg = load_run_config("single_acrobot")
cfg["trainer"].update({"evaluator": True, "seed": 19})
cfg["trainer"]["num_episodes"] = 150_000
cfg["saving"].update({"metrics_log_freq": 25, "model_params_save_freq": 10_000})

trainer = setup_trainer_and_train(
    cfg, results_dir="artifacts/round2/acrobot_a2c_cpu", verbose=True
)
rew, steps = trainer.evaluate_episodes(use_argmax=True)
print("FINAL EVAL mean episodic reward:", float(rew["shared"].mean()),
      "mean steps:", float(steps["shared"].mean()), flush=True)
