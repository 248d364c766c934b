"""Bound and attack the kNN selection cost on the chip.

Stages (env-only rollout, E=2000, packed ladder):
  A baseline       — current packed obs (6-channel fused selection)
  B ladder_only    — selection removed (am/valid checksum): bounds how
                     much of the obs time the feature selection costs
  C packed16       — prototype: 6 channels quantized to 16-bit pairs and
                     packed into 3 int32 planes; selection is 3 integer
                     masked-sum passes instead of 6 f32 ones; unpack and
                     assemble after (quantization abs error ~3e-5 on
                     [-1,1]-normalized features)
One JSON line per stage.
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
    """Return observe_single(state)->obs implementing the selection mode."""
    N = env.num_agents
    k = env.num_other_agents_observed
    diag = env.grid_diagonal
    max_speed = env.max_speed
    T_len = env.episode_length
    types_f = jnp.asarray(env.agent_types, dtype=jnp.float32)
    eps = np.float32(1e-10)

    def observe(state):
        t = state["_timestep_"]
        still_i = state["still_in_the_game"]
        loc_x, loc_y = state["loc_x"], state["loc_y"]
        still_f = still_i.astype(jnp.float32)
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
        b = max(1, int(N - 1).bit_length())
        low_mask = np.int32((1 << b) - 1)
        sentinel = np.int32(np.iinfo(np.int32).max)
        valid_max = np.int32(np.float32(1e18).view(np.int32))
        d2i = jnp.bitwise_or(
            jnp.bitwise_and(lax.bitcast_convert_type(d2, jnp.int32),
                            ~low_mask), col_j)
        prev = jnp.full((N, 1), -1, dtype=jnp.int32)
        ms, ams, valids = [], [], []
        for _ in range(k):
            m = jnp.min(jnp.where(d2i > prev, d2i, sentinel), axis=1)
            ms.append(m)
            valids.append((m < valid_max).astype(jnp.float32))
            ams.append(jnp.bitwise_and(m, low_mask))
            prev = m[:, None]
        am_all = jnp.stack(ams, axis=1)
        valid_all = jnp.stack(valids, axis=1)

        if mode == "ladder_only":
            # no feature selection: fabricate obs from am/valid only
            fake = (am_all.astype(jnp.float32) / N)[:, :, None]
            v = valid_all[:, :, None]
            slot_blk = jnp.concatenate(
                [jnp.broadcast_to(fake, (N, k, 5)), fake, v, v], axis=2)
        elif mode == "packed16":
            src6 = jnp.concatenate([feats, types_f[None, :]], axis=0)
            q = jnp.clip(
                jnp.round((src6 + 1.0) * 32767.0), 0, 65534
            ).astype(jnp.int32)  # (6, N)
            planes = jnp.stack(
                [jnp.bitwise_or(jnp.left_shift(q[2 * i], 16), q[2 * i + 1])
                 for i in range(3)], axis=0)  # (3, N) int32
            onehot_b = col_j[:, None, :] == am_all[:, :, None]  # (N,k,N)
            selp = jnp.sum(
                jnp.where(onehot_b[:, :, None, :],
                          planes[None, None, :, :], 0),
                axis=3)  # (N, k, 3) int32
            # mask after the shift: the high half's top bit lands in the
            # int32 sign bit, and arithmetic right-shift sign-extends
            hi = jnp.bitwise_and(
                jnp.right_shift(selp, 16), 0xFFFF).astype(jnp.float32)
            lo = jnp.bitwise_and(selp, 0xFFFF).astype(jnp.float32)
            nbr = jnp.stack(
                [hi[:, :, 0], lo[:, :, 0], hi[:, :, 1], lo[:, :, 1],
                 hi[:, :, 2], lo[:, :, 2]], axis=2) / 32767.0 - 1.0
            v = valid_all[:, :, None]
            slot_blk = jnp.concatenate(
                [(nbr[:, :, :5] - feats.T[:, None, :]) * v,
                 nbr[:, :, 5:6] * v, v, v], axis=2)
        else:  # baseline: 6-channel f32 fused selection
            src6 = jnp.concatenate([feats, types_f[None, :]], axis=0)
            onehot_b = col_j[:, None, :] == am_all[:, :, None]
            nbr = jnp.sum(
                jnp.where(onehot_b[:, :, None, :],
                          src6[None, None, :, :], 0.0),
                axis=3)  # (N, k, 6)
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

    # numeric check of packed16 vs baseline on one state (CPU-comparable)
    st1 = {kk: v[0] for kk, v in eng.state.items()
           if kk not in ("observations", "sampled_actions")}
    ob_base = np.asarray(build_variant(env, "baseline")(st1))
    ob_p16 = np.asarray(build_variant(env, "packed16")(st1))
    emit(stage="numcheck_packed16",
         max_abs=float(np.max(np.abs(ob_base - ob_p16))),
         ok=bool(np.max(np.abs(ob_base - ob_p16)) < 2e-4))

    for mode in ("baseline", "ladder_only", "packed16"):
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
