"""
Round-3 TPU A/B #5: surgical decomposition of the MXU kNN kernel's cost.

Stripped experiment-only kernels (NOT library code), all at E=1000, B=2,
chained inputs:

  S0 io_only:      copy a tiny input slab to the output (launch + DMA floor)
  S1 setup_min:    build masked+packed d2i, one min pass, store row 0
  S2 setup_ladder: S1 + the full k=10 min+rewrite ladder (no acc store, no
                   selection, no emit) — pure ladder slope check
  S3 full v3:      the real mxu kernel (control, 0.842 ms known)

intercept = S1 - S0 (setup cost); ladder = (S2 - S1); selection+emit+write
= S3 - S2.
"""

import functools
import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r3_ab5_results.jsonl")
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("[ab5] acquiring device...", flush=True)
    dev = jax.devices()[0]
    print(f"[ab5] device acquired: {dev.platform} {dev}", flush=True)

    from warpdrive_tpu.presets import build_flagship
    from warpdrive_tpu.ops.knn_obs import (
        knn_observation, LANE, _BIG, _CLEAR_MASK, _BIG_PACKED, _VALID_MAX,
    )
    from warpdrive_tpu.utils.constants import Constants

    key = jax.random.PRNGKey(99)
    E, R, M, B = 1000, 8, 20, 2
    N_AG, K = 105, 10

    sys0 = build_flagship(num_envs=E, seed=0)
    env = sys0["env"]
    st0 = (sys0["state"], jnp.zeros(()))
    roll = jax.jit(lambda c, k: jax.lax.scan(
        lambda s, kk: (sys0["env_only_step"](s, kk), 0), c,
        jax.random.split(k, 50))[0])
    st0 = roll(st0, key)
    jax.block_until_ready(st0[0]["loc_x"])
    rolled = dict(st0[0])
    print("[ab5] rolled state ready", flush=True)

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

    # ---- experiment kernels ------------------------------------------------

    def k_io(xy_ref, src_ref, out_ref):
        out_ref[:] = src_ref[:]

    def _setup(xy_ref, src_ref, n_agents):
        Bk = xy_ref.shape[0]
        row_j = jax.lax.broadcasted_iota(jnp.int32, (Bk, LANE, LANE), 1)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (Bk, LANE, LANE), 2)
        x = xy_ref[:, 0, :]
        y = xy_ref[:, 1, :]
        still = src_ref[:, 6:7, :]
        dx = x[:, :, None] - x[:, None, :]
        dy = y[:, :, None] - y[:, None, :]
        d2 = dx * dx + dy * dy
        still_sub = jnp.transpose(still, (0, 2, 1))
        invalid = (row_j >= n_agents) | (row_j == col_i) | (still_sub < 0.5)
        d2 = jnp.where(invalid, _BIG, d2)
        return jnp.bitwise_or(
            jnp.bitwise_and(pltpu.bitcast(d2, jnp.int32), _CLEAR_MASK), row_j
        )

    def k_setup_min(xy_ref, src_ref, out_ref, *, n_agents):
        d2i = _setup(xy_ref, src_ref, n_agents)
        m = jnp.min(d2i, axis=1)  # (B, LANE)
        out_ref[:] = jnp.broadcast_to(
            m.astype(jnp.float32)[:, None, :], out_ref.shape
        )

    def k_setup_ladder(xy_ref, src_ref, out_ref, *, n_agents, k):
        d2i = _setup(xy_ref, src_ref, n_agents)

        def body(slot, carry):
            d2i, acc = carry
            m2 = jnp.min(d2i, axis=1, keepdims=True)
            acc = acc + m2.astype(jnp.float32)
            return jnp.where(d2i == m2, _BIG_PACKED, d2i), acc

        _, acc = jax.lax.fori_loop(
            0, k, body, (d2i, jnp.zeros((d2i.shape[0], 1, LANE), jnp.float32))
        )
        out_ref[:] = jnp.broadcast_to(acc, out_ref.shape)

    def run_experiment(kern, name):
        def call(lx, ly, feats, tf, sf, tn):
            pad_n = LANE - lx.shape[1]
            xy = jnp.stack(
                [jnp.pad(lx, ((0, 0), (0, pad_n))),
                 jnp.pad(ly, ((0, 0), (0, pad_n)))], axis=1)
            src = jnp.concatenate(
                [jnp.pad(feats, ((0, 0), (0, 0), (0, pad_n))),
                 jnp.pad(jnp.broadcast_to(tf[None, None, :],
                                          (E, 1, lx.shape[1])),
                         ((0, 0), (0, 0), (0, pad_n))),
                 jnp.pad(sf[:, None, :], ((0, 0), (0, 0), (0, pad_n))),
                 jnp.broadcast_to(tn[:, None, None], (E, 1, LANE))],
                axis=1)
            return pl.pallas_call(
                kern,
                grid=(E // B,),
                in_specs=[
                    pl.BlockSpec((B, 2, LANE), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, 8, LANE), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, 8, LANE), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((E, 8, LANE), jnp.float32),
            )(xy, src)

        def chain(state):
            cs = jnp.zeros(())
            for _ in range(R):
                out = call(*kernel_inputs(state))
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

    for name, kern in [
        ("io_only", k_io),
        ("setup_min", functools.partial(k_setup_min, n_agents=N_AG)),
        ("setup_ladder",
         functools.partial(k_setup_ladder, n_agents=N_AG, k=K)),
    ]:
        try:
            t0 = time.time()
            ms = run_experiment(kern, name)
            emit({"stage": "surgical", "kernel": name, "block_envs": B,
                  "ms_per_pass": round(ms, 3),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "surgical", "kernel": name,
                  "error": f"{type(exc).__name__}: {exc}"})

    # control: the real v3 at B=2 (known 0.842 from ab4)
    try:
        def chain(state):
            cs = jnp.zeros(())
            for _ in range(R):
                lx, ly, feats, tf, sf, tn = kernel_inputs(state)
                out = knn_observation(lx, ly, feats, tf, sf, tn,
                                      n_agents=N_AG, k=K, block_envs=B,
                                      variant="mxu")
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
        emit({"stage": "surgical", "kernel": "full_mxu", "block_envs": B,
              "ms_per_pass": round(dt / (R * M) * 1e3, 3)})
    except Exception as exc:
        emit({"stage": "surgical", "kernel": "full_mxu",
              "error": f"{type(exc).__name__}: {exc}"})

    emit({"stage": "done"})


if __name__ == "__main__":
    main()
