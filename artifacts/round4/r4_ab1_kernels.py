"""Round-4 A/B #1: flagship kNN kernel variants on the chip.

Measures env-only scan rates @E=1000 (the bench headline config) for the
round-3 default (pallas_mxu_exact) vs the round-4 v7 tiled kernels
(external operands / MXU distance build), plus a block-size sweep for the
winner.  lax.scan with fresh keys per repeat (CLAUDE.md rule 5).
"""
import json, time, sys
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

sys.path.insert(0, "/root/repo")
from bench import rollout_rate
from warpdrive_tpu.presets import build_flagship

OUT = "/root/repo/artifacts/round4/r4_ab1_results.jsonl"
N_STEPS = 500
E = 1000

def measure(algo, block_envs=2, num_envs=E):
    sys_ = build_flagship(num_envs=num_envs, fc_dims=(256, 256), seed=0,
                          knn_algorithm=algo)
    sys_["env"].knn_block_envs = block_envs  # read at trace time (first call)
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    rate = rollout_rate(sys_["env_only_step"],
                        (sys_["state"], jnp.zeros(())), N_STEPS,
                        num_envs, key)
    rec = {"algo": algo, "block_envs": block_envs, "num_envs": num_envs,
           "env_steps_per_sec": round(rate), "wall_s": round(time.time()-t0, 1)}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rate

for algo in ["pallas_mxu_exact", "pallas_tiled_exact", "pallas_mxudist_exact",
             "pallas_mxu", "pallas_tiled", "pallas_mxudist"]:
    try:
        measure(algo)
    except Exception as e:
        print(f"FAILED {algo}: {type(e).__name__}: {e}", flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps({"algo": algo, "error": str(e)[:300]}) + "\n")
print("AB1_DONE", flush=True)
