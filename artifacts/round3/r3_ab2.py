"""
Round-3 TPU A/B #2: the flagship obs kernel attack (VERDICT r3 item 1)
+ the exact-bench-default decision (item 4).

Stages (each flushes one JSON line to r3_ab2_results.jsonl immediately;
the risky Pallas-in-scan compile is LAST per CLAUDE.md rule 6):

  1. obs_micro: the batched kNN observe op ALONE @1000 envs, chained
     inputs (no tunnel memoization), 8-unrolled per program:
       packed+bf16pair (XLA control), ladder+bf16pair (exact candidate),
       pallas (v2 packed-argmin kernel), pallas_mxu (v3 MXU-select).
  2. mxu_exactness: pallas/pallas_mxu obs vs "passes" on a rolled state
     (on-chip Mosaic lowering, not interpret).
  3. env_only_1000 scan: ladder+bf16pair — the oracle-exact default
     candidate vs packed's 951K.
  4. stepdispatch: FULL env step (obs+physics+reset) with pallas_mxu,
     jitted once, dispatched per-step from Python (the fallback usage
     mode if Pallas-in-scan still bombs).
  5. pallas_scan (RISKY): pallas_mxu inside the 500-step lax.scan.
"""

import json
import os
import sys
import time

RESULTS = os.environ.get(
    "AB2_RESULTS",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "r3_ab2_results.jsonl"),
)
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

    print("[ab2] acquiring device...", flush=True)
    dev = jax.devices()[0]
    print(f"[ab2] device acquired: {dev.platform} {dev}", flush=True)

    from warpdrive_tpu.presets import build_flagship, FLAGSHIP_ENV_KWARGS
    from bench import rollout_rate

    key = jax.random.PRNGKey(123)
    E = int(os.environ.get("AB2_E", 1000))
    R = int(os.environ.get("AB2_R", 8))
    M = int(os.environ.get("AB2_M", 20))
    SCAN_T = int(os.environ.get("AB2_T", 500))
    DISPATCH_T = int(os.environ.get("AB2_DT", 300))

    # one rolled state reused across all obs-micro configs
    print("[ab2] building rolled state...", flush=True)
    sys0 = build_flagship(num_envs=E, seed=0)
    st0 = (sys0["state"], jnp.zeros(()))
    roll = jax.jit(lambda c, k: jax.lax.scan(
        lambda s, kk: (sys0["env_only_step"](s, kk), 0), c,
        jax.random.split(k, 50))[0])
    st0 = roll(st0, key)
    jax.block_until_ready(st0[0]["loc_x"])
    rolled = dict(st0[0])
    print("[ab2] rolled state ready", flush=True)

    # ---------------- stage 1: obs-op microbench ---------------------------
    def obs_micro(algo, sel):
        s2 = build_flagship(num_envs=E, seed=0, knn_algorithm=algo,
                            knn_select=sel)
        eng = s2["engine"]

        def chain(state):
            cs = jnp.zeros(())
            for _ in range(R):
                obs = eng.observe(state)
                cs = obs.sum() * np.float32(1e-20)
                state = dict(state)
                state["loc_x"] = state["loc_x"] + cs
            return state, cs

        fn = jax.jit(chain)
        state, cs = fn(dict(rolled))          # compile + warmup
        jax.block_until_ready(cs)
        t0 = time.perf_counter()
        for _ in range(M):
            state, cs = fn(state)
        jax.block_until_ready(cs)
        dt = time.perf_counter() - t0
        return E * R * M / dt, dt / (R * M) * 1e3  # env-obs/s, ms/pass

    for algo, sel in [("packed", "bf16pair"), ("ladder", "bf16pair"),
                      ("pallas", "fused"), ("pallas_mxu", "fused")]:
        try:
            t0 = time.time()
            rate, ms = obs_micro(algo, sel)
            emit({"stage": "obs_micro", "algo": algo, "select": sel,
                  "num_envs": E, "env_obs_per_sec": round(rate),
                  "ms_per_pass": round(ms, 3),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "obs_micro", "algo": algo, "select": sel,
                  "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 2: on-chip exactness of the kernels ------------
    try:
        t0 = time.time()
        obs = {}
        for algo in ("passes", "pallas", "pallas_mxu"):
            s2 = build_flagship(num_envs=64, seed=0, knn_algorithm=algo,
                                knn_select="fused")
            sub = {k: v[:64] for k, v in rolled.items()
                   if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == E}
            sub.update({k: v for k, v in rolled.items() if k not in sub})
            fn = jax.jit(lambda state, eng=s2["engine"]: eng.observe(state))
            obs[algo] = np.asarray(fn(sub))
        ref = obs["passes"]
        N = sys0["num_agents"]
        k_nbr = FLAGSHIP_ENV_KWARGS["num_other_agents_observed"]
        out = {"stage": "mxu_exactness",
               "slots_total": 64 * N * k_nbr,
               "elapsed_s": round(time.time() - t0, 1)}
        for algo in ("pallas", "pallas_mxu"):
            a = obs[algo][:, :, :8 * k_nbr].reshape(64, N, k_nbr, 8)
            b = ref[:, :, :8 * k_nbr].reshape(64, N, k_nbr, 8)
            out[f"{algo}_slot_deviations"] = int(
                (np.abs(a - b) > 1e-4).any(axis=-1).sum())
            out[f"{algo}_max_abs"] = float(np.abs(obs[algo] - ref).max())
        emit(out)
    except Exception as exc:
        emit({"stage": "mxu_exactness",
              "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 3: env-only scan, ladder+bf16pair --------------
    try:
        t0 = time.time()
        s2 = build_flagship(num_envs=E, seed=0, knn_algorithm="ladder",
                            knn_select="bf16pair")
        r = rollout_rate(s2["env_only_step"], (s2["state"], jnp.zeros(())),
                         SCAN_T, E, key)
        emit({"stage": "env_only_1000", "algo": "ladder",
              "select": "bf16pair", "env_steps_per_sec": round(r),
              "elapsed_s": round(time.time() - t0, 1)})
    except Exception as exc:
        emit({"stage": "env_only_1000", "algo": "ladder",
              "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 4: per-step dispatch with pallas_mxu -----------
    try:
        t0 = time.time()
        s2 = build_flagship(num_envs=E, seed=0, knn_algorithm="pallas_mxu")
        step = jax.jit(s2["env_only_step"])
        carry = (dict(rolled), jnp.zeros(()))
        k2 = jax.random.PRNGKey(7)
        carry = step(carry, k2)               # compile
        jax.block_until_ready(carry[1])
        steps = DISPATCH_T
        keys = [jax.random.fold_in(k2, i) for i in range(steps)]
        t1 = time.perf_counter()
        for i in range(steps):
            carry = step(carry, keys[i])
        jax.block_until_ready(carry[1])
        dt = time.perf_counter() - t1
        emit({"stage": "stepdispatch", "algo": "pallas_mxu", "num_envs": E,
              "env_steps_per_sec": round(E * steps / dt),
              "ms_per_step": round(dt / steps * 1e3, 3),
              "elapsed_s": round(time.time() - t0, 1)})
    except Exception as exc:
        emit({"stage": "stepdispatch", "algo": "pallas_mxu",
              "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 5 (RISKY, LAST): pallas_mxu in lax.scan --------
    try:
        t0 = time.time()
        s2 = build_flagship(num_envs=E, seed=0, knn_algorithm="pallas_mxu")
        r = rollout_rate(s2["env_only_step"], (s2["state"], jnp.zeros(())),
                         SCAN_T, E, key)
        emit({"stage": "pallas_scan", "algo": "pallas_mxu",
              "env_steps_per_sec": round(r),
              "elapsed_s": round(time.time() - t0, 1)})
    except Exception as exc:
        emit({"stage": "pallas_scan", "algo": "pallas_mxu",
              "error": f"{type(exc).__name__}: {exc}"})

    emit({"stage": "done"})


if __name__ == "__main__":
    main()
