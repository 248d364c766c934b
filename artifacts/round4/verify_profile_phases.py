"""Round-4 verify: direct update-phase timing on the real chip (A2C + DDPG)."""
import json, sys
import jax
print("devices:", jax.devices(), flush=True)

from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config

out = {}
cfg = load_run_config("single_cartpole")
cfg["trainer"].update({"num_envs": 64, "train_batch_size": 6400,
                       "num_episodes": 640, "seed": 2})
cfg["env"].update({"episode_length": 100, "reset_pool_size": 0})
cfg["saving"]["metrics_log_freq"] = 10**9
cfg["saving"]["model_params_save_freq"] = 10**9
print("training a2c (tiny)...", flush=True)
tr = setup_trainer_and_train(cfg, verbose=False, results_dir="/tmp/r4v_a2c")
prof = tr.profile_phases(repeats=3)
out["a2c"] = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in prof.items()}
print("A2C:", json.dumps(out["a2c"]), flush=True)

cfg = load_run_config("single_pendulum")
cfg["trainer"].update({"num_envs": 64, "train_batch_size": 3200,
                       "num_episodes": 320, "seed": 7, "n_step": 5})
cfg["env"].update({"episode_length": 100, "reset_pool_size": 50, "seed": 3})
cfg["saving"]["metrics_log_freq"] = 10**9
cfg["saving"]["model_params_save_freq"] = 10**9
print("training ddpg (tiny)...", flush=True)
tr = setup_trainer_and_train(cfg, verbose=False, results_dir="/tmp/r4v_ddpg")
prof = tr.profile_phases(repeats=3)
out["ddpg"] = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in prof.items()}
print("DDPG:", json.dumps(out["ddpg"]), flush=True)

ok = all(o["update_ms_direct"] and o["update_ms"] > 0 for o in out.values())
print("VERIFY_RESULT", "OK" if ok else "FAIL", flush=True)
json.dump(out, open("/root/repo/artifacts/round4/verify_profile_phases.json", "w"), indent=1)
