"""Regenerate the TagGridWorld multi-agent A2C artifact with the honest
done-masked evaluator.

Config note (documented deviation from the stock yaml): the stock
reference config uses grid_length=100 with episode_length=100 and corner/
center starts, where a tag is geometrically almost unreachable inside one
episode (the taggers need the full 100 steps to cross the grid) -- the
stock reference run is also only 10 iterations.  For a learning-evidence
artifact we shrink the grid to 20 (tag reachable) and train 300 iterations;
everything else matches the yaml.  Honest signals: eval mean episodic
steps < 99 (episodes end early on a tag) and positive tagger rewards.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config

cfg = load_run_config("tag_gridworld")
cfg["env"]["grid_length"] = 20
cfg["trainer"]["evaluator"] = True
cfg["trainer"]["num_episodes"] = 600_000  # 300 iterations
cfg["trainer"]["seed"] = 23
cfg["saving"]["metrics_log_freq"] = 15
cfg["saving"]["model_params_save_freq"] = 10_000

trainer = setup_trainer_and_train(
    cfg, results_dir="artifacts/round2/tag_gridworld_a2c_cpu", verbose=True
)
rew, steps = trainer.evaluate_episodes(use_argmax=True)
tagger = rew["shared"][:, :-1]  # taggers are agents 0..N-2
runner = rew["shared"][:, -1]
print("FINAL EVAL tagger mean:", float(tagger.mean()),
      "runner mean:", float(runner.mean()),
      "mean steps:", float(steps["shared"].mean()), flush=True)
