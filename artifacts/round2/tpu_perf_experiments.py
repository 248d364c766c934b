"""Staged TPU perf experiments for the flagship TagContinuous system.

Run by tpu_pipeline.sh after the chip claim succeeds. Each stage prints one
JSON line; stages are ordered so a late-stage compiler hang (the deliberate
Pallas-in-scan retest) cannot lose earlier results.

Stages:
  A. env-only env-steps/s vs num_envs (scaling sweep)
  B. decomposition at the headline size: physics+reset / +obs / full loop
  E. full loop with bfloat16 policy matmuls
  C. Pallas-in-scan retest (round-1 compile bomb) on a tiny scan
  D. if C passes: env-only rate with the Pallas kNN observation
"""

import json
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from warpdrive_tpu.presets import build_flagship, FLAGSHIP_ENV_KWARGS  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def time_scan(step_fn, carry, n_steps, num_envs, repeats=3, key=None):
    key = jax.random.PRNGKey(7) if key is None else key

    def scan_fn(c, k):
        keys = jax.random.split(k, n_steps)
        return jax.lax.scan(lambda s, kk: (step_fn(s, kk), 0), c, keys)[0]

    jitted = jax.jit(scan_fn)
    key, sub = jax.random.split(key)
    carry = jitted(carry, sub)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    best = 0.0
    for _ in range(repeats):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        carry = jitted(carry, sub)
        jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
        best = max(best, n_steps * num_envs / (time.perf_counter() - t0))
    return best


def random_actions(key, num_envs, n_agents, heads):
    mins = jnp.zeros((len(heads),), jnp.int32)
    maxs = jnp.asarray(heads, jnp.int32)
    return jax.random.randint(
        key, (num_envs, n_agents, len(heads)), mins, maxs, dtype=jnp.int32
    )


def stage_A():
    for ne in (500, 1000, 2000, 4000):
        try:
            s = build_flagship(num_envs=ne, seed=0)
            rate = time_scan(
                s["env_only_step"], (s["state"], jnp.zeros(())), 500, ne
            )
            emit(stage="A_env_only", num_envs=ne, env_steps_per_s=round(rate))
        except Exception as e:
            emit(stage="A_env_only", num_envs=ne, error=f"{type(e).__name__}: {e}")


def stage_B(ne=2000):
    s = build_flagship(num_envs=ne, seed=0)
    engine, heads = s["engine"], [10, 10]
    n_agents = s["num_agents"]

    def physics_only(state, key):
        k_a, k_r = jax.random.split(key)
        a = random_actions(k_a, ne, n_agents, heads)
        return engine.auto_reset(engine.step_physics(state, a), k_r)

    try:
        rate_p = time_scan(physics_only, s["state"], 500, ne)
        emit(stage="B_physics_reset", num_envs=ne, env_steps_per_s=round(rate_p))
    except Exception as e:
        emit(stage="B_physics_reset", error=f"{type(e).__name__}: {e}")

    try:
        rate_e = time_scan(
            s["env_only_step"], (s["state"], jnp.zeros(())), 500, ne
        )
        emit(stage="B_physics_obs_reset", num_envs=ne,
             env_steps_per_s=round(rate_e))
    except Exception as e:
        emit(stage="B_physics_obs_reset", error=f"{type(e).__name__}: {e}")

    try:
        params = s["params"]
        def full(state, key):
            return s["full_loop_step"](params, state, key)
        rate_f = time_scan(full, s["state"], 500, ne)
        emit(stage="B_full_loop", num_envs=ne, env_steps_per_s=round(rate_f))
    except Exception as e:
        emit(stage="B_full_loop", error=f"{type(e).__name__}: {e}")


def stage_U(ne=2000):
    """env-only rate with lax.scan unroll=4 (amortizes loop overhead; can
    also blow up compile time — measure both)."""
    try:
        s = build_flagship(num_envs=ne, seed=0)

        def scan_fn(c, k):
            keys = jax.random.split(k, 500)
            return jax.lax.scan(
                lambda st, kk: (s["env_only_step"](st, kk), 0), c, keys,
                unroll=4,
            )[0]

        jitted = jax.jit(scan_fn)
        carry = (s["state"], jnp.zeros(()))
        t0 = time.time()
        carry = jitted(carry, jax.random.PRNGKey(5))
        jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
        compile_s = time.time() - t0
        best = 0.0
        for i in range(3):
            t0 = time.perf_counter()
            carry = jitted(carry, jax.random.PRNGKey(6 + i))
            jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
            best = max(best, 500 * ne / (time.perf_counter() - t0))
        emit(stage="U_env_only_unroll4", num_envs=ne,
             env_steps_per_s=round(best), compile_s=round(compile_s, 1))
    except Exception as e:
        emit(stage="U_env_only_unroll4", error=f"{type(e).__name__}: {e}")


def stage_P(ne=2000):
    """Capture a jax.profiler trace of the env-only scan for op-level
    analysis (written under artifacts/round2/tpu_trace)."""
    try:
        s = build_flagship(num_envs=ne, seed=0)

        def scan_fn(c, k):
            keys = jax.random.split(k, 50)
            return jax.lax.scan(
                lambda st, kk: (s["env_only_step"](st, kk), 0), c, keys
            )[0]

        jitted = jax.jit(scan_fn)
        carry = (s["state"], jnp.zeros(()))
        carry = jitted(carry, jax.random.PRNGKey(3))
        jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
        logdir = "/root/repo/artifacts/round2/tpu_trace"
        with jax.profiler.trace(logdir):
            carry = jitted(carry, jax.random.PRNGKey(4))
            jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
        emit(stage="P_profile_trace", logdir=logdir)
    except Exception as e:
        emit(stage="P_profile_trace", error=f"{type(e).__name__}: {e}")


def stage_F(ne=2000):
    """env-only rate with the single-pass top_k kNN observation (verified
    numerically identical to the k-round argmin algorithm)."""
    try:
        from warpdrive_tpu.envs.engine import EnvEngine
        from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous

        env = TpuTagContinuous(knn_algorithm="topk", **FLAGSHIP_ENV_KWARGS)
        engine = EnvEngine(env_obj=env, num_envs=ne, seed=0)
        n_agents = engine.n_agents
        state = {
            k: v
            for k, v in engine.state.items()
            if k not in ("observations", "sampled_actions")
        }

        def env_only(carry, key):
            st, chk = carry
            k_a, k_r = jax.random.split(key)
            a = random_actions(k_a, ne, n_agents, [10, 10])
            chk = chk + engine.observe(st).sum()
            st = engine.step_physics(st, a)
            return engine.auto_reset(st, k_r), chk

        rate = time_scan(env_only, (state, jnp.zeros(())), 500, ne)
        emit(stage="F_env_only_topk_obs", num_envs=ne,
             env_steps_per_s=round(rate))
    except Exception as e:
        emit(stage="F_env_only_topk_obs", error=f"{type(e).__name__}: {e}")


def stage_G(ne=2000):
    """env-only rate with a bfloat16 distance matrix feeding the top_k
    selection (halves the dominant HBM term of the roofline; features are
    still computed in f32 from the exact state). Selection can differ from
    f32 near ties — this is an experiment variant, not the default."""
    try:
        from warpdrive_tpu.envs.engine import EnvEngine
        from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous

        env = TpuTagContinuous(knn_algorithm="topk", **FLAGSHIP_ENV_KWARGS)
        engine = EnvEngine(env_obj=env, num_envs=ne, seed=0)
        n_agents = engine.n_agents
        k = env.num_other_agents_observed
        _BIG = jnp.float32(1e10)

        def observe_bf16(state):
            def one_env(st):
                lx, ly = st["loc_x"], st["loc_y"]
                alive = st["still_in_the_game"] > 0
                dx = (lx[:, None] - lx[None, :]).astype(jnp.bfloat16)
                dy = (ly[:, None] - ly[None, :]).astype(jnp.bfloat16)
                d2 = dx * dx + dy * dy
                d2 = jnp.where(
                    jnp.eye(n_agents, dtype=bool) | (~alive)[None, :],
                    jnp.bfloat16(_BIG), d2,
                )
                _, nbr_idx = jax.lax.top_k(-d2.astype(jnp.float32), k)
                return nbr_idx.sum()  # keep selection live

            return jax.vmap(one_env)(state)

        def env_only(carry, key):
            st, chk = carry
            k_a, k_r = jax.random.split(key)
            a = random_actions(k_a, ne, n_agents, [10, 10])
            chk = chk + observe_bf16(st).sum()
            st = engine.step_physics(st, a)
            return engine.auto_reset(st, k_r), chk

        state = {
            kk: v
            for kk, v in engine.state.items()
            if kk not in ("observations", "sampled_actions")
        }
        rate = time_scan(env_only, (state, jnp.int32(0)), 500, ne)
        emit(stage="G_env_only_bf16_dist_select", num_envs=ne,
             env_steps_per_s=round(rate))
    except Exception as e:
        emit(stage="G_env_only_bf16_dist_select",
             error=f"{type(e).__name__}: {e}")


def stage_H(ne=2000):
    """FULL loop (policy+sample+step+reset) with the single-pass top_k
    observation — the best-known pure-XLA headline candidate."""
    try:
        from warpdrive_tpu.presets import build_flagship

        s = build_flagship(num_envs=ne, seed=0, knn_algorithm="topk")
        params = s["params"]

        def full(state, key):
            return s["full_loop_step"](params, state, key)

        rate = time_scan(full, s["state"], 500, ne)
        emit(stage="H_full_loop_topk_obs", num_envs=ne,
             env_steps_per_s=round(rate))
    except Exception as e:
        emit(stage="H_full_loop_topk_obs", error=f"{type(e).__name__}: {e}")


def stage_E(ne=2000):
    try:
        from warpdrive_tpu.models.fully_connected import FullyConnected
        from warpdrive_tpu.sampling.samplers import sample_from_logits
        from warpdrive_tpu.utils.constants import Constants

        s = build_flagship(num_envs=ne, seed=0)
        engine = s["engine"]
        heads = [10, 10]
        n_agents = s["num_agents"]
        ids_arr = {t: jnp.asarray(v) for t, v in s["policy_ids"].items()}
        models = {
            t: FullyConnected(
                fc_dims=(256, 256), output_dims=(10, 10), dtype=jnp.bfloat16
            )
            for t in ids_arr
        }
        obs0 = engine.observe(s["state"])
        rng = jax.random.PRNGKey(0)
        params = {}
        for tag, ids in ids_arr.items():
            obs_p = jnp.take(obs0, ids, axis=1)
            obs_p = obs_p.reshape(obs_p.shape[:2] + (-1,))
            rng, sub = jax.random.split(rng)
            params[tag] = models[tag].init(sub, obs_p[:1])

        def full_bf16(state, key):
            k_act, k_reset = jax.random.split(key)
            obs_all = engine.observe(state)
            actions = jnp.zeros((ne, n_agents, 2), dtype=jnp.int32)
            keys = jax.random.split(k_act, 2 * len(ids_arr))
            for i, (tag, ids) in enumerate(sorted(ids_arr.items())):
                obs_p = jnp.take(obs_all, ids, axis=1)
                obs_p = obs_p.reshape(obs_p.shape[:2] + (-1,))
                logits_list, _ = models[tag].apply(params[tag], obs_p)
                cols = [
                    sample_from_logits(keys[2 * i + j], l.astype(jnp.float32))
                    for j, l in enumerate(logits_list)
                ]
                actions = actions.at[:, ids, :].set(jnp.stack(cols, axis=-1))
            state = engine.step_physics(state, actions)
            return engine.auto_reset(state, k_reset)

        rate = time_scan(full_bf16, s["state"], 500, ne)
        emit(stage="E_full_loop_bf16", num_envs=ne, env_steps_per_s=round(rate))
    except Exception as e:
        emit(stage="E_full_loop_bf16", error=f"{type(e).__name__}: {e}")


def _pallas_observe(env, ne):
    from warpdrive_tpu.ops.knn_obs import knn_observation

    diag = env.grid_diagonal
    max_speed = env.max_speed
    k = env.num_other_agents_observed
    types_f = jnp.asarray(env.agent_types, dtype=jnp.float32)
    N = env.num_agents
    T_len = env.episode_length
    eps = 1e-10

    def observe(state):
        lx, ly = state["loc_x"], state["loc_y"]
        feats = jnp.stack(
            [
                lx / diag,
                ly / diag,
                state["speed"] / (max_speed + eps),
                state["acceleration"] / (max_speed + eps),
                state["direction"] / np.float32(2 * np.pi),
            ],
            axis=1,
        )  # (E, 5, N)
        still_f = state["still_in_the_game"].astype(jnp.float32)
        t_norm = (state["_timestep_"] / T_len).astype(jnp.float32)
        return knn_observation(
            lx, ly, feats, types_f, still_f, t_norm, n_agents=N, k=k
        )

    return observe


def stage_C_and_D(ne=2000):
    # C: tiny Pallas-in-scan probe (round-1: compile bomb; retest)
    try:
        s = build_flagship(num_envs=8, seed=0)
        env = s["env"]
        observe = _pallas_observe(env, 8)
        engine = s["engine"]

        def step_with_pallas_obs(carry, key):
            state, chk = carry
            k_a, k_r = jax.random.split(key)
            a = random_actions(k_a, 8, s["num_agents"], [10, 10])
            chk = chk + observe(state).sum()
            state = engine.step_physics(state, a)
            return (engine.auto_reset(state, k_r), chk), 0

        t0 = time.time()
        out = jax.jit(
            lambda c, ks: jax.lax.scan(step_with_pallas_obs, c, ks)[0]
        )((s["state"], jnp.zeros(())), jax.random.split(jax.random.PRNGKey(1), 4))
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        emit(stage="C_pallas_in_scan", ok=True, compile_s=round(time.time() - t0, 1))
    except Exception as e:
        emit(stage="C_pallas_in_scan", ok=False, error=f"{type(e).__name__}: {e}")
        return

    # D: headline rate with Pallas obs
    try:
        s = build_flagship(num_envs=ne, seed=0)
        env, engine = s["env"], s["engine"]
        observe = _pallas_observe(env, ne)

        def env_only_pallas(carry, key):
            state, chk = carry
            k_a, k_r = jax.random.split(key)
            a = random_actions(k_a, ne, s["num_agents"], [10, 10])
            chk = chk + observe(state).sum()
            state = engine.step_physics(state, a)
            return engine.auto_reset(state, k_r), chk

        rate = time_scan(
            lambda c, k: env_only_pallas(c, k), (s["state"], jnp.zeros(())),
            500, ne,
        )
        emit(stage="D_env_only_pallas_obs", num_envs=ne,
             env_steps_per_s=round(rate))
    except Exception as e:
        emit(stage="D_env_only_pallas_obs", error=f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    import os

    forced = os.environ.get("JAX_PLATFORMS")
    if forced:  # the axon sitecustomize latches the TPU platform otherwise
        jax.config.update("jax_platforms", forced)
    emit(stage="start", platform=jax.devices()[0].platform)
    if os.environ.get("PERF_SMOKE"):  # tiny CPU smoke of every stage
        global_ne = 8
        _orig = time_scan

        def time_scan_smoke(step_fn, carry, n_steps, num_envs, repeats=1,
                            key=None):
            return _orig(step_fn, carry, 4, num_envs, repeats=1, key=key)

        time_scan = time_scan_smoke
        stage_B(ne=8)
        stage_P(ne=8)
        stage_F(ne=8)
        stage_H(ne=8)
        stage_G(ne=8)
        stage_U(ne=8)
        stage_E(ne=8)
        stage_C_and_D(ne=8)
    else:
        stage_A()
        stage_B()
        stage_P()
        stage_F()
        stage_H()
        stage_G()
        stage_U()
        stage_E()
        stage_C_and_D()
    emit(stage="done")
