"""
Round-3 TPU A/B #8: Pallas block size in the REAL scan (the obs-micro
B-trend in ab3/ab4 was contaminated by execution memoization).
env-only scans @1000, mxu and mxu_exact, B in {4, 8, 16}.
"""

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r3_ab8_results.jsonl")
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

    print("[ab8] acquiring device...", flush=True)
    dev = jax.devices()[0]
    print(f"[ab8] device acquired: {dev.platform} {dev}", flush=True)

    import warpdrive_tpu.presets as presets
    from bench import rollout_rate

    key = jax.random.PRNGKey(1313)
    E, SCAN_T = 1000, 500

    for algo in ("pallas_mxu", "pallas_mxu_exact"):
        for B in (4, 8, 16):
            try:
                t0 = time.time()
                kw = dict(presets.FLAGSHIP_ENV_KWARGS)
                presets.FLAGSHIP_ENV_KWARGS["knn_block_envs"] = B
                try:
                    s2 = presets.build_flagship(
                        num_envs=E, seed=0, knn_algorithm=algo)
                finally:
                    presets.FLAGSHIP_ENV_KWARGS.clear()
                    presets.FLAGSHIP_ENV_KWARGS.update(kw)
                r = rollout_rate(s2["env_only_step"],
                                 (s2["state"], jnp.zeros(())),
                                 SCAN_T, E, key)
                emit({"stage": "env_only_1000", "algo": algo,
                      "block_envs": B, "env_steps_per_sec": round(r),
                      "elapsed_s": round(time.time() - t0, 1)})
            except Exception as exc:
                emit({"stage": "env_only_1000", "algo": algo,
                      "block_envs": B,
                      "error": f"{type(exc).__name__}: {exc}"})

    emit({"stage": "done"})


if __name__ == "__main__":
    main()
