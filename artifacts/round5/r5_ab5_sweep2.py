"""Round-5 A/B #5: exact-class E-sweep at the new B=4 optimum + B=8
check + mxudist retry at B=4."""
import json
import sys
import time

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from bench import rollout_rate  # noqa: E402
from warpdrive_tpu.presets import build_flagship  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab5_results.jsonl"
N_STEPS = 500


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def measure(algo, block_envs=4, num_envs=2000):
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


for cfg in [
    ("pallas_flat_exact", 4, 1000),
    ("pallas_flat_exact", 4, 4000),
    ("pallas_flat_exact", 8, 2000),
    ("pallas_flat_mxudist_exact", 4, 2000),
    ("pallas_flat_mxudist", 4, 2000),
    ("pallas_flat", 4, 1500),
]:
    algo, be, ne = cfg
    try:
        measure(algo, block_envs=be, num_envs=ne)
    except Exception as e:
        emit({"algo": algo, "block_envs": be, "num_envs": ne,
              "error": f"{type(e).__name__}: {str(e)[:300]}"})

print("AB5_DONE", flush=True)
