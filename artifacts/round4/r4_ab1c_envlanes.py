"""Round-4 A/B #1c: the v8 ENVS-ON-LANES kernel on the chip (VERDICT r4
next #1 route (a) — the one layout the round-3 ceiling argument is
conditioned on not having tried).

Flagship env-only scan @E=1000/2000 for envlanes[_exact] vs the r4_ab1
numbers (mxu_exact 1006K, tiled 1310K @1000).
"""
import json, time, sys
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

sys.path.insert(0, "/root/repo")
from bench import rollout_rate
from warpdrive_tpu.presets import build_flagship

OUT = "/root/repo/artifacts/round4/r4_ab1c_results.jsonl"
N_STEPS = 500


def measure(algo, num_envs):
    sys_ = build_flagship(num_envs=num_envs, fc_dims=(256, 256), seed=0,
                          knn_algorithm=algo)
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    rate = rollout_rate(sys_["env_only_step"],
                        (sys_["state"], jnp.zeros(())), N_STEPS,
                        num_envs, key)
    rec = {"algo": algo, "num_envs": num_envs,
           "env_steps_per_sec": round(rate),
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rate


for algo, E in [
    ("pallas_envlanes_exact", 1000),
    ("pallas_envlanes", 1000),
    ("pallas_envlanes_exact", 2000),
    ("pallas_envlanes", 4000),
]:
    try:
        measure(algo, E)
    except Exception as e:
        print(f"FAILED {algo} E={E}: {type(e).__name__}: {e}", flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps({"algo": algo, "num_envs": E,
                                "error": str(e)[:300]}) + "\n")
print("AB1C_DONE", flush=True)
