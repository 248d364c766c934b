"""Regenerate the CartPole A2C learning artifact with the HONEST
(done-masked) evaluator wired into training (trainer.evaluator=True).

Run:  JAX_PLATFORMS=cpu python artifacts/round2/run_cartpole.py
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize latches axon

from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config

cfg = load_run_config("single_cartpole")
cfg["trainer"]["evaluator"] = True           # honest argmax eval every log
cfg["trainer"]["num_episodes"] = 200_000     # 2000 iterations
cfg["trainer"]["seed"] = 17
cfg["saving"]["metrics_log_freq"] = 25
cfg["saving"]["model_params_save_freq"] = 500

trainer = setup_trainer_and_train(
    cfg, results_dir="artifacts/round2/cartpole_a2c_cpu", verbose=True
)
rew, steps = trainer.evaluate_episodes(use_argmax=True)
print("FINAL EVAL mean episodic reward:",
      float(rew["shared"].sum(axis=1).mean()),
      "mean steps:", float(steps["shared"].mean()), flush=True)
