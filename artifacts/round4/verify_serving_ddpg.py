"""Round-4 verify: DDPG actor export/load/act on the real chip."""
import numpy as np, jax
print("devices:", jax.devices(), flush=True)
from warpdrive_tpu.serving import export_policy, load_policy
from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config

cfg = load_run_config("single_pendulum")
cfg["trainer"].update({"num_envs": 8, "train_batch_size": 400,
                       "num_episodes": 80, "seed": 7, "n_step": 3})
cfg["env"].update({"episode_length": 50, "reset_pool_size": 0, "seed": 3})
cfg["saving"]["metrics_log_freq"] = 10**9
cfg["saving"]["model_params_save_freq"] = 10**9
tr = setup_trainer_and_train(cfg, verbose=False, results_dir="/tmp/r4v_srv")
bundle = export_policy(tr, "shared", "/tmp/r4v_srv/bundle")
act, man = load_policy(bundle)
obs = np.random.RandomState(0).randn(4, 1, man["obs_size"]).astype(np.float32)
a = act(obs)
ok = np.isfinite(a).all() and (np.abs(a) <= man["action_scale"] + 1e-6).all()
print("actions:", a.ravel(), flush=True)
print("VERIFY_RESULT", "OK" if ok else "FAIL", flush=True)
