"""TagContinuous two-policy adversarial training with the honest
done-masked evaluator (CPU; reduced scale for CPU budget, full config is
the TPU bench target). Run: python artifacts/round2/run_tag_continuous.py"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config

cfg = load_run_config("tag_continuous")
# reduced scale, documented: 3 taggers + 20 runners, 100-step episodes
cfg["env"].update({"num_taggers": 3, "num_runners": 20, "episode_length": 100,
                   "grid_length": 10.0, "num_other_agents_observed": 5})
cfg["trainer"].update({"num_envs": 30, "train_batch_size": 3000,
                       "num_episodes": 60_000, "seed": 31,  # 200 iterations
                       "evaluator": True})
cfg["saving"].update({"metrics_log_freq": 10, "model_params_save_freq": 10_000})

trainer = setup_trainer_and_train(
    cfg, results_dir="artifacts/round2/tag_continuous_cpu", verbose=True
)
rew, steps = trainer.evaluate_episodes(use_argmax=True)
print("FINAL EVAL tagger:", float(rew["tagger"].mean()),
      "runner:", float(rew["runner"].mean()),
      "steps:", float(steps["tagger"].mean()), flush=True)
