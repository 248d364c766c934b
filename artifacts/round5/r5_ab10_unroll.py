"""Round-5 A/B #10: static ladder unroll (cross-slot scheduling)."""
import json, sys, time
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from bench import rollout_rate_stats
from warpdrive_tpu.presets import build_flagship

OUT = "/root/repo/artifacts/round5/r5_ab10_results.jsonl"

def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")

def measure(algo, ne, unroll):
    sys_ = build_flagship(num_envs=ne, fc_dims=(256, 256), seed=0,
                          knn_algorithm=algo)
    sys_["env"].knn_flat_unroll = unroll
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    st = rollout_rate_stats(sys_["env_only_step"],
                            (sys_["state"], jnp.zeros(())), 500, ne, key,
                            repeats=5)
    emit({"algo": algo, "num_envs": ne, "unroll": unroll,
          "median": round(st["value"]), "min": round(st["min"]),
          "max": round(st["max"]), "n": st["n"],
          "wall_s": round(time.time()-t0, 1)})

for algo, ne, un in [
    ("pallas_flat_exact", 1000, True),
    ("pallas_flat", 1000, True),
    ("pallas_flat", 1024, True),
]:
    try:
        measure(algo, ne, un)
    except Exception as e:
        emit({"algo": algo, "num_envs": ne, "unroll": un,
              "error": f"{type(e).__name__}: {str(e)[:300]}"})
print("AB10_DONE", flush=True)
