"""Round-3 TPU A/B #9: B=2 check + full-loop at the winning block size."""

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r3_ab9_results.jsonl")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def emit(obj):
    line = json.dumps(obj)
    print("[RESULT] " + line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main():
    import jax
    import jax.numpy as jnp

    print("[ab9] acquiring device...", flush=True)
    dev = jax.devices()[0]
    print(f"[ab9] device acquired: {dev.platform} {dev}", flush=True)

    import warpdrive_tpu.presets as presets
    from bench import rollout_rate

    key = jax.random.PRNGKey(2121)
    E, SCAN_T = 1000, 500

    def build(algo, B):
        kw = dict(presets.FLAGSHIP_ENV_KWARGS)
        presets.FLAGSHIP_ENV_KWARGS["knn_block_envs"] = B
        try:
            return presets.build_flagship(num_envs=E, seed=0,
                                          knn_algorithm=algo)
        finally:
            presets.FLAGSHIP_ENV_KWARGS.clear()
            presets.FLAGSHIP_ENV_KWARGS.update(kw)

    for algo, B in [("pallas_mxu", 2), ("pallas_mxu_exact", 2),
                    ("pallas_mxu", 1), ("pallas_mxu_exact", 1)]:
        try:
            t0 = time.time()
            s2 = build(algo, B)
            r = rollout_rate(s2["env_only_step"],
                             (s2["state"], jnp.zeros(())), SCAN_T, E, key)
            emit({"stage": "env_only_1000", "algo": algo, "block_envs": B,
                  "env_steps_per_sec": round(r),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "env_only_1000", "algo": algo, "block_envs": B,
                  "error": f"{type(exc).__name__}: {exc}"})

    for algo in ("pallas_mxu", "pallas_mxu_exact"):
        for B in (2, 4):
            try:
                t0 = time.time()
                s2 = build(algo, B)
                r = rollout_rate(s2["full_loop_step"], s2["state"], SCAN_T,
                                 E, key, params=s2["params"])
                emit({"stage": "full_loop_1000", "algo": algo,
                      "block_envs": B, "env_steps_per_sec": round(r),
                      "elapsed_s": round(time.time() - t0, 1)})
            except Exception as exc:
                emit({"stage": "full_loop_1000", "algo": algo,
                      "block_envs": B,
                      "error": f"{type(exc).__name__}: {exc}"})

    emit({"stage": "done"})


if __name__ == "__main__":
    main()
