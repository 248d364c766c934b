"""Round-5 A/B #7: (a) tagger-set physics (21x less tagging work,
bit-identical) — now baked in, vs the ab6 controls; (b) pallas
allow_input_fusion (fuse the ~0.27 ms/fleet-step of pad/concat input
prep into the kernel call); measured on env-only AND full-loop."""
import json
import sys
import time

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from bench import rollout_rate_stats  # noqa: E402
from warpdrive_tpu.presets import build_flagship  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab7_results.jsonl"
N_STEPS = 500


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def measure(tag, num_envs, fusion, full_loop=False, algo=None):
    sys_ = build_flagship(num_envs=num_envs, fc_dims=(256, 256), seed=0,
                          knn_algorithm=algo)
    sys_["env"].knn_input_fusion = fusion
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    if full_loop:
        st = rollout_rate_stats(
            sys_["full_loop_step"], sys_["state"], N_STEPS, num_envs,
            key, params=sys_["params"], repeats=5)
    else:
        st = rollout_rate_stats(
            sys_["env_only_step"], (sys_["state"], jnp.zeros(())),
            N_STEPS, num_envs, key, repeats=5)
    emit({"tag": tag, "num_envs": num_envs, "fusion": fusion,
          "full_loop": full_loop,
          "median": round(st["value"]), "min": round(st["min"]),
          "max": round(st["max"]), "n": st["n"],
          "wall_s": round(time.time() - t0, 1)})


for tag, ne, fusion, fl, algo in [
    # env-only, exact: physics fix alone vs ab6 (1203K/1134K controls)
    ("envonly_exact", 1000, False, False, None),
    ("envonly_exact", 2000, False, False, None),
    # + input fusion
    ("envonly_exact_fused", 1000, True, False, None),
    ("envonly_exact_fused", 2000, True, False, None),
    # packed fast stage
    ("envonly_packed_fused", 1000, True, False, "pallas_flat"),
    # full loop (r4: 747K @E=2000)
    ("fullloop", 2000, False, True, None),
    ("fullloop_fused", 2000, True, True, None),
    ("fullloop_fused", 1000, True, True, None),
]:
    try:
        measure(tag, ne, fusion, fl, algo)
    except Exception as e:
        emit({"tag": tag, "num_envs": ne, "fusion": fusion,
              "error": f"{type(e).__name__}: {str(e)[:300]}"})

print("AB7_DONE", flush=True)
