"""
Round-3 TPU A/B #4: decompose the MXU kernel's 0.9 ms/pass by sweeping k.

The kernel's per-pass cost = setup (distance matrix + mask + pack) +
k x per-slot ladder work (min, eq, acc store, rewrite) + MXU dot + emit +
HBM obs write.  Timing k in {1, 2, 5, 10} at fixed inputs gives the
per-slot slope and the fixed intercept — deciding whether a sorted-group
ladder redesign (cuts per-slot full-matrix work) is worth building.

Also: B=2 micro (the sweep said smaller B is better: 4 < 8 < 16 < 32).
"""

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r3_ab4_results.jsonl")
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

    print("[ab4] acquiring device...", flush=True)
    dev = jax.devices()[0]
    print(f"[ab4] device acquired: {dev.platform} {dev}", flush=True)

    from warpdrive_tpu.presets import build_flagship
    from warpdrive_tpu.ops.knn_obs import knn_observation
    from warpdrive_tpu.utils.constants import Constants

    key = jax.random.PRNGKey(77)
    E, R, M = 1000, 8, 20

    sys0 = build_flagship(num_envs=E, seed=0)
    env = sys0["env"]
    st0 = (sys0["state"], jnp.zeros(()))
    roll = jax.jit(lambda c, k: jax.lax.scan(
        lambda s, kk: (sys0["env_only_step"](s, kk), 0), c,
        jax.random.split(k, 50))[0])
    st0 = roll(st0, key)
    jax.block_until_ready(st0[0]["loc_x"])
    rolled = dict(st0[0])
    print("[ab4] rolled state ready", flush=True)

    N = env.num_agents
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

    def kernel_micro(variant, B, k):
        def chain(state):
            cs = jnp.zeros(())
            for _ in range(R):
                lx, ly, feats, tf, sf, tn = kernel_inputs(state)
                out = knn_observation(
                    lx, ly, feats, tf, sf, tn, n_agents=N, k=k,
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

    for variant in ("mxu", "mxu_exact"):
        for k in (1, 2, 5, 10):
            try:
                t0 = time.time()
                ms = kernel_micro(variant, 4, k)
                emit({"stage": "k_sweep", "variant": variant, "k": k,
                      "block_envs": 4, "ms_per_pass": round(ms, 3),
                      "elapsed_s": round(time.time() - t0, 1)})
            except Exception as exc:
                emit({"stage": "k_sweep", "variant": variant, "k": k,
                      "error": f"{type(exc).__name__}: {exc}"})

    for B in (1, 2):
        try:
            t0 = time.time()
            ms = kernel_micro("mxu", B, 10)
            emit({"stage": "b_small", "variant": "mxu", "k": 10,
                  "block_envs": B, "ms_per_pass": round(ms, 3),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "b_small", "block_envs": B,
                  "error": f"{type(exc).__name__}: {exc}"})

    emit({"stage": "done"})


if __name__ == "__main__":
    main()
