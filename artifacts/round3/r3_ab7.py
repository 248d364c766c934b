"""
Round-3 TPU A/B #7: final kernel numbers after the SUB=112 sublane trim
(v3/v4).  SCAN-based only — the obs-micro chain harness in ab2-ab6 used a
vanishing perturbation (sum * 1e-20 underflows below loc_x's f32 ulp), so
identical inputs could hit the tunnel's cross-process execution
memoization after ~16 calls; lax.scan rollouts draw fresh keys per step
and are immune.

Stages: env_only + full_loop scans @1000 for pallas_mxu and
pallas_mxu_exact (pre-trim controls: 1051K/756K and 867K/660K), plus an
exactness re-check.
"""

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r3_ab7_results.jsonl")
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
    import numpy as np

    print("[ab7] acquiring device...", flush=True)
    dev = jax.devices()[0]
    print(f"[ab7] device acquired: {dev.platform} {dev}", flush=True)

    from warpdrive_tpu.presets import build_flagship
    from bench import rollout_rate

    key = jax.random.PRNGKey(888)
    E, SCAN_T = 1000, 500

    for algo in ("pallas_mxu", "pallas_mxu_exact"):
        try:
            t0 = time.time()
            s2 = build_flagship(num_envs=E, seed=0, knn_algorithm=algo)
            r = rollout_rate(s2["env_only_step"],
                             (s2["state"], jnp.zeros(())), SCAN_T, E, key)
            emit({"stage": "env_only_1000", "algo": algo,
                  "env_steps_per_sec": round(r),
                  "elapsed_s": round(time.time() - t0, 1)})
            t0 = time.time()
            r = rollout_rate(s2["full_loop_step"], s2["state"], SCAN_T, E,
                             key, params=s2["params"])
            emit({"stage": "full_loop_1000", "algo": algo,
                  "env_steps_per_sec": round(r),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "scan", "algo": algo,
                  "error": f"{type(exc).__name__}: {exc}"})

    # exactness re-check on a rolled state
    try:
        t0 = time.time()
        E2 = 64
        sys0 = build_flagship(num_envs=E2, seed=0)
        st0 = (sys0["state"], jnp.zeros(()))
        roll = jax.jit(lambda c, k: jax.lax.scan(
            lambda s, kk: (sys0["env_only_step"](s, kk), 0), c,
            jax.random.split(k, 50))[0])
        st0 = roll(st0, key)
        jax.block_until_ready(st0[0]["loc_x"])
        rolled = dict(st0[0])
        obs = {}
        for algo in ("passes", "pallas_mxu", "pallas_mxu_exact"):
            s2 = build_flagship(num_envs=E2, seed=0, knn_algorithm=algo,
                                knn_select="fused")
            fn = jax.jit(lambda state, eng=s2["engine"]: eng.observe(state))
            obs[algo] = np.asarray(fn(rolled))
        ref = obs["passes"]
        N = sys0["num_agents"]
        k_nbr = sys0["env"].num_other_agents_observed
        out = {"stage": "exactness", "slots_total": E2 * N * k_nbr,
               "elapsed_s": round(time.time() - t0, 1)}
        for algo in ("pallas_mxu", "pallas_mxu_exact"):
            a = obs[algo][:, :, :8 * k_nbr].reshape(E2, N, k_nbr, 8)
            b = ref[:, :, :8 * k_nbr].reshape(E2, N, k_nbr, 8)
            out[f"{algo}_slot_deviations"] = int(
                (np.abs(a - b) > 1e-4).any(axis=-1).sum())
            out[f"{algo}_max_abs"] = float(np.abs(obs[algo] - ref).max())
        emit(out)
    except Exception as exc:
        emit({"stage": "exactness", "error": f"{type(exc).__name__}: {exc}"})

    emit({"stage": "done"})


if __name__ == "__main__":
    main()
