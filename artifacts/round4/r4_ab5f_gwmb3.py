"""mb64/mb128 extension (mb32 = 19.12M)."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/artifacts/round4")
import importlib.util
spec = importlib.util.spec_from_file_location(
    "ab5e", "/root/repo/artifacts/round4/r4_ab5e_gwmb2.py")
# can't import (module-level loop) — inline instead
import json, time
import jax
print("devices:", jax.devices(), flush=True)
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.envs.tag_gridworld import TpuTagGridWorld
from warpdrive_tpu.training.trainer_a2c import TrainerA2C

OUT = "/root/repo/artifacts/round4/r4_ab5_results.jsonl"

def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")

def measure(mb):
    env = TpuTagGridWorld(num_taggers=4, grid_length=20,
                          episode_length=100, seed=7,
                          use_full_observation=False)
    engine = EnvEngine(env_obj=env, num_envs=32000, seed=7)
    cfg = {
        "name": "r4ab5f", "env": {},
        "trainer": {"num_envs": 32000, "num_episodes": 128000,
                    "train_batch_size": 3200000, "seed": 1,
                    "batch_dtype": "bfloat16"},
        "policy": {"shared": {"to_train": True, "gamma": 0.98,
                              "lr": 0.001, "num_minibatches": mb,
                              "shuffle_minibatches": False,
                              "model": {"type": "fully_connected",
                                        "fc_dims": [64, 64],
                                        "dtype": "bfloat16"}}},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "r4ab5f", "tag": "t"},
    }
    t0 = time.time()
    tr = TrainerA2C(env_wrapper=engine, config=cfg, verbose=False)
    prof = tr.profile_phases(repeats=3)
    log({"variant": f"postfix_mb{mb}_32k",
         "steps_per_sec": round(prof["steps_per_sec"]),
         "rollout_ms": round(prof["rollout_ms"], 2),
         "update_ms": round(prof["update_ms"], 2),
         "wall_s": round(time.time() - t0, 1)})
    tr.graceful_close()

for mb in (64, 128):
    try:
        measure(mb)
    except Exception as e:
        log({"variant": f"postfix_mb{mb}_32k",
             "error": f"{type(e).__name__}: {e}"[:300]})
print("AB5F_DONE", flush=True)
