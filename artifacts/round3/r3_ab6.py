"""
Round-3 TPU A/B #6: the two-level-select kernel (v6) vs v3/v4.

Stages (flush-per-line to r3_ab6_results.jsonl):
  1. kernel_micro: twolevel / twolevel_exact at B in {2, 4, 8, 16, 32}
     (controls: mxu@B=2 = 0.842 ms, mxu_exact@B=4 = 1.148 known).
  2. exactness: pallas_twolevel_exact + pallas_twolevel vs passes.
  3. env_only scans @1000: pallas_twolevel, pallas_twolevel_exact.
  4. full_loop scans @1000: both.
"""

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r3_ab6_results.jsonl")
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

    print("[ab6] acquiring device...", flush=True)
    dev = jax.devices()[0]
    print(f"[ab6] device acquired: {dev.platform} {dev}", flush=True)

    from warpdrive_tpu.presets import build_flagship
    from warpdrive_tpu.ops.knn_obs import knn_observation
    from warpdrive_tpu.utils.constants import Constants
    from bench import rollout_rate

    key = jax.random.PRNGKey(555)
    E, R, M, SCAN_T = 1000, 8, 20, 500

    sys0 = build_flagship(num_envs=E, seed=0)
    env = sys0["env"]
    st0 = (sys0["state"], jnp.zeros(()))
    roll = jax.jit(lambda c, k: jax.lax.scan(
        lambda s, kk: (sys0["env_only_step"](s, kk), 0), c,
        jax.random.split(k, 50))[0])
    st0 = roll(st0, key)
    jax.block_until_ready(st0[0]["loc_x"])
    rolled = dict(st0[0])
    print("[ab6] rolled state ready", flush=True)

    N = env.num_agents
    k_nbr = env.num_other_agents_observed
    types_f = jnp.asarray(env.agent_types, dtype=jnp.float32)

    def kernel_inputs(state):
        feats = jnp.stack(
            [
                state["loc_x"] / env.grid_diagonal,
                state["loc_y"] / env.grid_diagonal,
                state["speed"] / (env.max_speed + np.float32(1e-10)),
                state["acceleration"] / (env.max_speed + np.float32(1e-10)),
                state["direction"] / np.float32(2 * np.pi),
            ],
            axis=1,
        )
        return (
            state["loc_x"], state["loc_y"], feats, types_f,
            state["still_in_the_game"].astype(jnp.float32),
            (state[Constants.TIMESTEP] / env.episode_length
             ).astype(jnp.float32),
        )

    def kernel_micro(variant, B):
        def chain(state):
            cs = jnp.zeros(())
            for _ in range(R):
                lx, ly, feats, tf, sf, tn = kernel_inputs(state)
                out = knn_observation(
                    lx, ly, feats, tf, sf, tn, n_agents=N, k=k_nbr,
                    block_envs=B, variant=variant)
                cs = out.sum() * np.float32(1e-20)
                state = dict(state)
                state["loc_x"] = state["loc_x"] + cs
            return state, cs

        fn = jax.jit(chain)
        state, cs = fn(dict(rolled))
        jax.block_until_ready(cs)
        t0 = time.perf_counter()
        for _ in range(M):
            state, cs = fn(state)
        jax.block_until_ready(cs)
        dt = time.perf_counter() - t0
        return dt / (R * M) * 1e3

    for variant in ("twolevel", "twolevel_exact"):
        for B in (2, 4, 8, 16, 32):
            try:
                t0 = time.time()
                ms = kernel_micro(variant, B)
                emit({"stage": "kernel_micro", "variant": variant,
                      "block_envs": B, "ms_per_pass": round(ms, 3),
                      "env_obs_per_sec": round(E / ms * 1e3),
                      "elapsed_s": round(time.time() - t0, 1)})
            except Exception as exc:
                emit({"stage": "kernel_micro", "variant": variant,
                      "block_envs": B,
                      "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 2: exactness -----------------------------------
    try:
        t0 = time.time()
        obs = {}
        E2 = 64
        for algo in ("passes", "pallas_twolevel", "pallas_twolevel_exact"):
            s2 = build_flagship(num_envs=E2, seed=0, knn_algorithm=algo,
                                knn_select="fused")
            sub = {k2: (v[:E2] if hasattr(v, "ndim") and v.ndim >= 1
                        and v.shape[0] == E else v)
                   for k2, v in rolled.items()}
            fn = jax.jit(lambda state, eng=s2["engine"]: eng.observe(state))
            obs[algo] = np.asarray(fn(sub))
        ref = obs["passes"]
        out = {"stage": "exactness", "slots_total": E2 * N * k_nbr,
               "elapsed_s": round(time.time() - t0, 1)}
        for algo in ("pallas_twolevel", "pallas_twolevel_exact"):
            a = obs[algo][:, :, :8 * k_nbr].reshape(E2, N, k_nbr, 8)
            b = ref[:, :, :8 * k_nbr].reshape(E2, N, k_nbr, 8)
            out[f"{algo}_slot_deviations"] = int(
                (np.abs(a - b) > 1e-4).any(axis=-1).sum())
            out[f"{algo}_max_abs"] = float(np.abs(obs[algo] - ref).max())
        emit(out)
    except Exception as exc:
        emit({"stage": "exactness", "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stages 3+4: scans ------------------------------------
    for algo in ("pallas_twolevel", "pallas_twolevel_exact"):
        try:
            t0 = time.time()
            s2 = build_flagship(num_envs=E, seed=0, knn_algorithm=algo)
            r = rollout_rate(s2["env_only_step"],
                             (s2["state"], jnp.zeros(())), SCAN_T, E, key)
            emit({"stage": "env_only_1000", "algo": algo,
                  "env_steps_per_sec": round(r),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "env_only_1000", "algo": algo,
                  "error": f"{type(exc).__name__}: {exc}"})
    for algo in ("pallas_twolevel", "pallas_twolevel_exact"):
        try:
            t0 = time.time()
            s2 = build_flagship(num_envs=E, seed=0, knn_algorithm=algo)
            r = rollout_rate(s2["full_loop_step"], s2["state"], SCAN_T, E,
                             key, params=s2["params"])
            emit({"stage": "full_loop_1000", "algo": algo,
                  "env_steps_per_sec": round(r),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "full_loop_1000", "algo": algo,
                  "error": f"{type(exc).__name__}: {exc}"})

    emit({"stage": "done"})


if __name__ == "__main__":
    main()
