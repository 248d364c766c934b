"""Round-5 A/B #2: Mosaic grid-dimension semantics + block re-sweep on
the v9 flat kernel (attack on the 0.23 ms/1000-env per-block launch
floor, the largest single term of the r3_ab5 decomposition).

Grid steps write disjoint out blocks; "parallel" semantics let Mosaic
pipeline/reorder them.  Sweep (dimsem x block_envs) for flat_exact and
flat (packed) @E=2000.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

sys.path.insert(0, "/root/repo")
from bench import rollout_rate  # noqa: E402
from warpdrive_tpu.presets import build_flagship  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab2_results.jsonl"
N_STEPS = 500
E = 2000


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def measure(algo, block_envs=2, dimsem=""):
    sys_ = build_flagship(num_envs=E, fc_dims=(256, 256), seed=0,
                          knn_algorithm=algo)
    sys_["env"].knn_block_envs = block_envs
    sys_["env"].knn_flat_dimsem = dimsem
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    rate = rollout_rate(sys_["env_only_step"],
                        (sys_["state"], jnp.zeros(())), N_STEPS, E, key)
    rec = {"algo": algo, "block_envs": block_envs, "dimsem": dimsem,
           "env_steps_per_sec": round(rate),
           "wall_s": round(time.time() - t0, 1)}
    emit(rec)
    return rate


for algo in ["pallas_flat", "pallas_flat_exact"]:
    for dimsem in ["parallel,parallel", "arbitrary,arbitrary"]:
        for be in [2, 4, 8]:
            try:
                measure(algo, block_envs=be, dimsem=dimsem)
            except Exception as e:
                emit({"algo": algo, "block_envs": be, "dimsem": dimsem,
                      "error": f"{type(e).__name__}: {str(e)[:300]}"})

print("AB2_DONE", flush=True)
