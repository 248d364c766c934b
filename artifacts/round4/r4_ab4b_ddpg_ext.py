"""Round-4 A/B #4b: extend the DDPG env-count sweep upward (the ab4
curve was still rising at 32K: 29.2M @16K -> 36.4M @32K)."""
import json, time, sys
import jax
print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from warpdrive_tpu.training.scripts.train import setup_trainer
from warpdrive_tpu.utils.config import load_run_config

OUT = "/root/repo/artifacts/round4/r4_ab4_results.jsonl"

def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")

def measure(n_envs, batch_dtype="float32", model_dtype="float32",
            batch_per_env=100):
    cfg = load_run_config("single_pendulum")
    cfg["trainer"]["num_envs"] = n_envs
    cfg["trainer"]["train_batch_size"] = batch_per_env * n_envs
    cfg["trainer"]["num_episodes"] = 4 * n_envs
    cfg["trainer"]["seed"] = 7
    if batch_dtype != "float32":
        cfg["trainer"]["batch_dtype"] = batch_dtype
    if model_dtype != "float32":
        for pol in cfg["policy"].values():
            pol.setdefault("model", {})["dtype"] = model_dtype
    cfg["env"]["episode_length"] = 100
    cfg["saving"] = {"metrics_log_freq": 10**9,
                     "model_params_save_freq": 10**9,
                     "basedir": "/tmp", "name": "r4ab4b", "tag": "t"}
    t0 = time.time()
    tr = setup_trainer(cfg, verbose=False)
    prof = tr.profile_phases(repeats=3)
    log({"num_envs": n_envs, "batch_dtype": batch_dtype,
         "model_dtype": model_dtype,
         "steps_per_sec": round(prof["steps_per_sec"]),
         "rollout_ms": round(prof["rollout_ms"], 2),
         "update_ms": round(prof["update_ms"], 2),
         "wall_s": round(time.time() - t0, 1)})
    tr.graceful_close()

for n_envs, bdt, mdt in [
    (32000, "float32", "float32"),
    (64000, "bfloat16", "bfloat16"),
    (64000, "float32", "float32"),
    (128000, "bfloat16", "bfloat16"),
]:
    try:
        measure(n_envs, bdt, mdt)
    except Exception as e:
        log({"num_envs": n_envs, "batch_dtype": bdt, "model_dtype": mdt,
             "error": f"{type(e).__name__}: {e}"[:300]})
print("AB4B_DONE", flush=True)
