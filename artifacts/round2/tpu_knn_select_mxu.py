"""kNN neighbor-feature selection on the MXU: low-bit one-hot matmuls.

The fused VPU selection (generate the (N,k,N) one-hot on the fly, masked
sum over 6 f32 channels) costs ~1.3 ms/step at E=2000 — about half the
obs time. A plain f32 one-hot einsum loses (materializes + streams an
882 MB operand, measured 460-485 K). But the one-hot operand is 0/1, so
it can be int8 (221 MB) or bf16 (441 MB), and MXU matmuls with a one-hot
LHS select EXACTLY (a single 1 per row -> no accumulation error):

  int8limb : features quantized to 2^-21 absolute (3 int8 limbs per
             channel, 18 RHS columns); s8 x s8 -> s32 MXU dot; recombine.
  bf16pair : features split hi/lo bf16 (12 RHS columns); bf16 MXU dot
             with f32 accumulation; recombine to ~1.5e-5 abs.

Stages time the env-only rollout (E=2000, packed ladder for am/valid in
all modes); numcheck validates each variant against the f32 baseline on
one real state. One JSON line per stage.
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
        am_all = jnp.stack(ams, axis=1)  # (N, k) int32
        valid_all = jnp.stack(valids, axis=1)

        src6 = jnp.concatenate([feats, types_f[None, :]], axis=0)  # (6, N)

        if mode == "int8limb":
            # features -> 3 signed-int8 limbs of a 2^21 fixed-point value
            # scale 2^21-1 (not 2^21): keeps q <= 2^21-1 so l0 <= 127
            # even for a feature exactly == 1.0 (agent-type channel)
            q = jnp.round(
                jnp.clip(src6, -1.0, 1.0) * np.float32((1 << 21) - 1)
            ).astype(jnp.int32)  # (6, N), |q| <= 2^21-1
            l0 = jnp.right_shift(q, 14)                    # [-128, 128]
            l0 = jnp.clip(l0, -128, 127)
            r0 = q - jnp.left_shift(l0, 14)
            l1 = jnp.right_shift(r0, 7)
            l2 = r0 - jnp.left_shift(l1, 7)
            limbs = jnp.concatenate([l0, l1, l2], axis=0).astype(jnp.int8)
            onehot = (col_j[:, None, :] == am_all[:, :, None]).astype(
                jnp.int8)  # (N, k, N)
            sel = lax.dot_general(
                onehot.reshape(N * k, N), limbs.T,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(N, k, 18)
            o0 = sel[:, :, 0:6].astype(jnp.float32)
            o1 = sel[:, :, 6:12].astype(jnp.float32)
            o2 = sel[:, :, 12:18].astype(jnp.float32)
            nbr = (o0 * np.float32(1 << 14) + o1 * np.float32(1 << 7)
                   + o2) / np.float32((1 << 21) - 1)  # (N, k, 6)
        elif mode == "bf16pair":
            hi = src6.astype(jnp.bfloat16)
            lo = (src6 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            pair = jnp.concatenate([hi, lo], axis=0)  # (12, N) bf16
            onehot = (col_j[:, None, :] == am_all[:, :, None]).astype(
                jnp.bfloat16)
            sel = lax.dot_general(
                onehot.reshape(N * k, N), pair.T,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(N, k, 12)
            nbr = sel[:, :, :6] + sel[:, :, 6:]
        else:  # baseline: fused VPU masked sum
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

    st1 = {kk: v[0] for kk, v in eng.state.items()
           if kk not in ("observations", "sampled_actions")}
    ob_base = np.asarray(build_variant(env, "baseline")(st1))
    for mode in ("int8limb", "bf16pair"):
        ob = np.asarray(build_variant(env, mode)(st1))
        err = float(np.max(np.abs(ob_base - ob)))
        emit(stage="numcheck", mode=mode, max_abs=err, ok=bool(err < 1e-4))

    for mode in ("baseline", "int8limb", "bf16pair"):
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
