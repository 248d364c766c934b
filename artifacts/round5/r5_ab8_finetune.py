"""Round-5 A/B #8: fine-tune the fused exact config toward the 1.4M bar
(E x B resweep under input fusion)."""
import json
import sys
import time

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from bench import rollout_rate_stats  # noqa: E402
from warpdrive_tpu.presets import build_flagship  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab8_results.jsonl"
N_STEPS = 500


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def measure(num_envs, block_envs, algo=None, dimsem=""):
    sys_ = build_flagship(num_envs=num_envs, fc_dims=(256, 256), seed=0,
                          knn_algorithm=algo)
    sys_["env"].knn_input_fusion = True
    sys_["env"].knn_block_envs = block_envs
    sys_["env"].knn_flat_dimsem = dimsem
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    st = rollout_rate_stats(
        sys_["env_only_step"], (sys_["state"], jnp.zeros(())),
        N_STEPS, num_envs, key, repeats=5)
    emit({"algo": algo or "pallas_flat_exact", "num_envs": num_envs,
          "block_envs": block_envs, "dimsem": dimsem,
          "median": round(st["value"]), "min": round(st["min"]),
          "max": round(st["max"]), "n": st["n"],
          "wall_s": round(time.time() - t0, 1)})


for ne, be, algo, ds in [
    (1024, 4, None, ""),
    (768, 4, None, ""),
    (1280, 4, None, ""),
    (1000, 8, None, ""),
    (1000, 4, None, "parallel,parallel"),
    (512, 4, None, ""),
    (1000, 8, "pallas_flat", ""),
    (1024, 4, "pallas_flat", ""),
]:
    try:
        measure(ne, be, algo, ds)
    except Exception as e:
        emit({"num_envs": ne, "block_envs": be, "algo": algo,
              "error": f"{type(e).__name__}: {str(e)[:300]}"})

print("AB8_DONE", flush=True)
