"""Regenerate the TagGridWorld multi-agent A2C artifact with the honest
done-masked evaluator. Run: python artifacts/round2/run_tag_gridworld.py"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config

cfg = load_run_config("tag_gridworld")
cfg["trainer"]["evaluator"] = True
cfg["trainer"]["num_episodes"] = 400_000  # 200 iterations (stock config is only 10)
cfg["trainer"]["seed"] = 23
cfg["saving"]["metrics_log_freq"] = 10
cfg["saving"]["model_params_save_freq"] = 2000

trainer = setup_trainer_and_train(
    cfg, results_dir="artifacts/round2/tag_gridworld_a2c_cpu", verbose=True
)
rew, steps = trainer.evaluate_episodes(use_argmax=True)
print("FINAL EVAL per-agent mean reward:", float(rew["shared"].mean()),
      "mean steps:", float(steps["shared"].mean()), flush=True)
