"""Round-5 A/B #4: (a) the 5-op exact tie-break (t==mi reuse) across
block sizes, (b) block + env-count sweep of the packed flat kernel
around its new B=4 optimum."""
import json
import sys
import time

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from bench import rollout_rate  # noqa: E402
from warpdrive_tpu.presets import build_flagship  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab4_results.jsonl"
N_STEPS = 500


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def measure(algo, block_envs=2, num_envs=2000):
    sys_ = build_flagship(num_envs=num_envs, fc_dims=(256, 256), seed=0,
                          knn_algorithm=algo)
    sys_["env"].knn_block_envs = block_envs
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    rate = rollout_rate(sys_["env_only_step"],
                        (sys_["state"], jnp.zeros(())), N_STEPS,
                        num_envs, key)
    emit({"algo": algo, "block_envs": block_envs, "num_envs": num_envs,
          "env_steps_per_sec": round(rate),
          "wall_s": round(time.time() - t0, 1)})
    return rate


# (a) the new exact tie-break
for be in [2, 3, 4]:
    try:
        measure("pallas_flat_exact", block_envs=be)
    except Exception as e:
        emit({"algo": "pallas_flat_exact", "block_envs": be,
              "error": f"{type(e).__name__}: {str(e)[:300]}"})

# (b) packed flat fine sweep
for be in [3, 4, 5, 6]:
    try:
        measure("pallas_flat", block_envs=be)
    except Exception as e:
        emit({"algo": "pallas_flat", "block_envs": be,
              "error": f"{type(e).__name__}: {str(e)[:300]}"})

for ne in [1000, 4000]:
    try:
        measure("pallas_flat", block_envs=4, num_envs=ne)
    except Exception as e:
        emit({"algo": "pallas_flat", "num_envs": ne,
              "error": f"{type(e).__name__}: {str(e)[:300]}"})

print("AB4_DONE", flush=True)
