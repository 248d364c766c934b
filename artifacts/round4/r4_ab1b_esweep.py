"""Round-4 A/B #1b: flagship env-count sweep (VERDICT r4 next #1 route c)
+ block-size sweep for the exact kernels.

BASELINE says "1000+ replicas" — 1000 is the floor, not the cap; the
headline moves to the measured optimum.
"""
import json, time, sys
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

sys.path.insert(0, "/root/repo")
from bench import rollout_rate
from warpdrive_tpu.presets import build_flagship

OUT = "/root/repo/artifacts/round4/r4_ab1b_results.jsonl"
N_STEPS = 500


def measure(algo, block_envs=2, num_envs=1000):
    sys_ = build_flagship(num_envs=num_envs, fc_dims=(256, 256), seed=0,
                          knn_algorithm=algo)
    sys_["env"].knn_block_envs = block_envs
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


for algo, B, E in [
    # route (c): env-count sweep on the exact default
    ("pallas_mxu_exact", 2, 2000),
    ("pallas_mxu_exact", 2, 4000),
    ("pallas_mxu_exact", 2, 8000),
    # block-size re-sweep for the v7 tiled variants (operand prep differs)
    ("pallas_tiled_exact", 1, 1000),
    ("pallas_tiled_exact", 4, 1000),
    ("pallas_tiled", 4, 1000),
    ("pallas_tiled", 8, 1000),
    # best-E x best-B cross for the non-exact fast stage
    ("pallas_tiled", 2, 2000),
]:
    try:
        measure(algo, block_envs=B, num_envs=E)
    except Exception as e:
        print(f"FAILED {algo} B={B} E={E}: {type(e).__name__}: {e}",
              flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps({"algo": algo, "block_envs": B,
                                "num_envs": E, "error": str(e)[:300]}) + "\n")
print("AB1B_DONE", flush=True)
