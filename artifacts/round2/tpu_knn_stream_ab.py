"""A/B: single-read streaming top-k (insertion chain) vs the packed ladder.

The packed ladder does k=10 sequential min-passes, each re-reading the
(E, N, N) packed-key matrix from HBM (~880 MB/fleet-step at E=2000) —
the measured obs bound. The streaming variant keeps a per-row sorted
k-list and inserts one column at a time:

    s'_i = min(s_i, max(s_{i-1}, c)),  s_0 = -inf

an elementwise min/max chain XLA can fuse so the matrix is read ONCE
(~88 MB) at ~2*N*k ops/row compute. Keys are the same packed int32
(distance bits | candidate index), so the selected slots are bit-identical
to the packed ladder.

Modes (all use bf16pair MXU feature selection, the new default):
  packed       — baseline: current packed ladder
  stream_full  — 105 fully-unrolled inserts (one giant fusion candidate)
  stream7      — lax.scan over 7 column-chunks x 15 unrolled inserts
  stream3      — lax.scan over 3 column-chunks x 35 unrolled inserts

One JSON line per stage; numcheck asserts exact obs equality vs packed.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

_BIG = np.float32(1e20)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def build_variant(env, mode):
    N = env.num_agents
    k = env.num_other_agents_observed
    diag = env.grid_diagonal
    max_speed = env.max_speed
    T_len = env.episode_length
    types_f = jnp.asarray(env.agent_types, dtype=jnp.float32)
    eps = np.float32(1e-10)

    b = max(1, int(N - 1).bit_length())
    low_mask = np.int32((1 << b) - 1)
    sentinel = np.int32(np.iinfo(np.int32).max)
    valid_max = np.int32(np.float32(1e18).view(np.int32))
    neg_inf = np.int32(np.iinfo(np.int32).min)

    def observe(state):
        t = state["_timestep_"]
        still_i = state["still_in_the_game"]
        loc_x, loc_y = state["loc_x"], state["loc_y"]
        feats = jnp.stack([
            loc_x / diag, loc_y / diag,
            state["speed"] / (max_speed + eps),
            state["acceleration"] / (max_speed + eps),
            state["direction"] / np.float32(2 * np.pi),
        ])  # (5, N)
        t_norm = (t / T_len).astype(jnp.float32)
        alive_now = still_i > 0
        dx = loc_x[:, None] - loc_x[None, :]
        dy = loc_y[:, None] - loc_y[None, :]
        d2 = jnp.where(
            (jnp.eye(N, dtype=bool)) | (~alive_now)[None, :], _BIG,
            dx * dx + dy * dy)
        col_j = jnp.arange(N)[None, :]
        d2i = jnp.bitwise_or(
            jnp.bitwise_and(lax.bitcast_convert_type(d2, jnp.int32),
                            ~low_mask), col_j)  # (N, N) distinct keys

        if mode == "packed":
            prev = jnp.full((N, 1), -1, dtype=jnp.int32)
            ms = []
            for _ in range(k):
                m = jnp.min(jnp.where(d2i > prev, d2i, sentinel), axis=1)
                ms.append(m)
                prev = m[:, None]
            lists = jnp.stack(ms, axis=1)  # (N, k) ascending
        elif mode == "stream_full":
            lists = jnp.full((N, k), sentinel, dtype=jnp.int32)
            neg_col = jnp.full((N, 1), neg_inf, dtype=jnp.int32)
            for j in range(N):
                cand = d2i[:, j][:, None]
                shifted = jnp.concatenate([neg_col, lists[:, :-1]], axis=1)
                lists = jnp.minimum(lists, jnp.maximum(shifted, cand))
        else:
            C = {"stream7": 15, "stream3": 35}[mode]
            G = N // C
            rem = N - G * C
            neg_col = jnp.full((N, 1), neg_inf, dtype=jnp.int32)

            def insert_chunk(lists, chunk):  # chunk: (N, C)
                for c in range(chunk.shape[1]):
                    cand = chunk[:, c][:, None]
                    shifted = jnp.concatenate(
                        [neg_col, lists[:, :-1]], axis=1)
                    lists = jnp.minimum(
                        lists, jnp.maximum(shifted, cand))
                return lists

            lists = jnp.full((N, k), sentinel, dtype=jnp.int32)
            chunks = jnp.moveaxis(
                d2i[:, :G * C].reshape(N, G, C), 1, 0)  # (G, N, C)
            lists = lax.scan(
                lambda ls, ch: (insert_chunk(ls, ch), 0), lists, chunks
            )[0]
            if rem:
                lists = insert_chunk(lists, d2i[:, G * C:])

        valid_all = (lists < valid_max).astype(jnp.float32)  # (N, k)
        am_all = jnp.bitwise_and(lists, low_mask)  # (N, k)

        # bf16pair MXU selection (matches production default)
        src6 = jnp.concatenate([feats, types_f[None, :]], axis=0)
        hi = src6.astype(jnp.bfloat16)
        lo = (src6 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        pair = jnp.concatenate([hi, lo], axis=0)  # (12, N)
        onehot16 = (col_j[:, None, :] == am_all[:, :, None]).astype(
            jnp.bfloat16)
        sel = lax.dot_general(
            onehot16.reshape(N * k, N), pair.T,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(N, k, 12)
        nbr = sel[:, :, :6] + sel[:, :, 6:]
        v = valid_all[:, :, None]
        slot_blk = jnp.concatenate(
            [(nbr[:, :, :5] - feats.T[:, None, :]) * v,
             nbr[:, :, 5:6] * v, v, v], axis=2)
        obs = jnp.concatenate(
            [slot_blk.reshape(N, -1), jnp.full((N, 1), t_norm)], axis=1)
        return jnp.where(alive_now[:, None], obs, 0.0).astype(jnp.float32)

    return observe


def main():
    emit(stage="start", platform=jax.devices()[0].platform)
    from warpdrive_tpu.presets import build_flagship

    ne, steps = 2000, 500
    s = build_flagship(num_envs=ne, seed=0)
    eng = s["engine"]
    env = eng.env
    heads = [int(n) for n in env.action_space[0].nvec]

    st1 = {kk: v[0] for kk, v in eng.state.items()
           if kk not in ("observations", "sampled_actions")}
    ob_base = np.asarray(build_variant(env, "packed")(st1))
    for mode in ("stream_full", "stream7", "stream3"):
        ob = np.asarray(build_variant(env, mode)(st1))
        err = float(np.max(np.abs(ob_base - ob)))
        emit(stage="numcheck", mode=mode, max_abs=err, ok=bool(err == 0.0))

    for mode in ("packed", "stream_full", "stream7", "stream3"):
        observe = build_variant(env, mode)

        def one_step(carry, key, observe=observe):
            state, checksum = carry
            k_act, k_reset = jax.random.split(key)
            actions = jax.random.randint(
                k_act, (ne, env.num_agents, len(heads)),
                jnp.zeros((len(heads),), jnp.int32),
                jnp.asarray(heads, jnp.int32), dtype=jnp.int32)
            checksum = checksum + jax.vmap(observe)(dict(state)).sum()
            state = eng.step_physics(state, actions)
            return (eng.auto_reset(state, k_reset), checksum)

        @jax.jit
        def run(carry, key):
            return lax.scan(
                lambda c, kk: (one_step(c, kk), 0), carry,
                jax.random.split(key, steps))[0]

        carry = (s["state"], jnp.zeros(()))
        key = jax.random.PRNGKey(5)
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        carry = run(carry, sub)
        jax.block_until_ready(carry[1])
        compile_s = time.perf_counter() - t0
        best = 0.0
        for _ in range(3):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            carry = run(carry, sub)
            jax.block_until_ready(carry[1])
            best = max(best, steps * ne / (time.perf_counter() - t0))
        emit(stage="env_only", mode=mode, num_envs=ne,
             env_steps_per_s=round(best), compile_s=round(compile_s, 1))

    emit(stage="done")


if __name__ == "__main__":
    main()
