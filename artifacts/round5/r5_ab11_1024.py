"""Round-5 A/B #11: the 1024-agent stage (VERDICT r4 next #7).

(a) variant A/B at the bench geometry (20 taggers + 1004 runners, grid
    60, k=10, E=256): tiled_exact control (r4 bench: 17.0K env-steps/s)
    vs the v9 flat family (tagger-set physics + fusion + unroll now
    baked in) and the mxudist route — the exact case the verdict argued
    the MXU distance build should win (1024^2 >> prep).
(b) surgical decomposition at N=1024: io / dist+min / ladder stages so
    the per-term floors are measured, not inferred from E-scaling.
"""
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from bench import rollout_rate_stats  # noqa: E402
from warpdrive_tpu.envs.engine import EnvEngine  # noqa: E402
from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous  # noqa: E402
from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS  # noqa: E402
from warpdrive_tpu.ops.knn_obs import (  # noqa: E402
    LANE, _BIG, _VALID_MAX,
)
from warpdrive_tpu.utils.constants import Constants as _C  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab11_results.jsonl"
E, N_AG, K = 256, 1024, 10
N_STEPS = 100
SUBn = N_AG  # 1024 is already a multiple of 8
NT = N_AG // LANE  # 8 observer tiles


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def build(algo):
    env = TpuTagContinuous(**dict(
        FLAGSHIP_ENV_KWARGS, num_taggers=20, num_runners=1004,
        grid_length=60.0, seed=0, knn_algorithm=algo,
        knn_select="bf16pair"))
    eng = EnvEngine(env_obj=env, num_envs=E, seed=0)
    state = {k: v for k, v in eng.state.items()
             if k not in ("observations", "sampled_actions")}
    return env, eng, state


def make_step(env, eng, obs_fn):
    heads = [int(n) for n in env.action_space[0].nvec]
    n_agents = eng.n_agents

    def step(carry, kk):
        st, checksum = carry
        k_act, k_reset = jax.random.split(kk)
        actions = jax.random.randint(
            k_act, (E, n_agents, len(heads)),
            jnp.zeros((len(heads),), jnp.int32),
            jnp.asarray(heads, jnp.int32), dtype=jnp.int32)
        if obs_fn is not None:
            checksum = checksum + obs_fn(st).sum()
        st = eng.step_physics(st, actions)
        return eng.auto_reset(st, k_reset), checksum

    return step


def measure(tag, algo, obs_override=None, repeats=3):
    env, eng, state = build(algo)
    obs_fn = obs_override if obs_override is not None else (
        lambda s: eng.observe(s))
    key = jax.random.PRNGKey(7)
    t0 = time.time()
    st = rollout_rate_stats(make_step(env, eng, obs_fn),
                            (state, jnp.zeros(())), N_STEPS, E, key,
                            repeats=repeats)
    emit({"stage": tag, "algo": algo,
          "median": round(st["value"]),
          "agent_steps_per_sec": round(st["value"] * N_AG),
          "min": round(st["min"]), "max": round(st["max"]), "n": st["n"],
          "wall_s": round(time.time() - t0, 1)})
    return st["value"]


# ---- (a) variant A/B ----------------------------------------------------
for tag, algo in [
    ("tiled_exact_control", "pallas_tiled_exact"),
    ("flat_exact", "pallas_flat_exact"),
    ("flat_packed", "pallas_flat"),
    ("flat_mxudist_exact", "pallas_flat_mxudist_exact"),
    ("flat_mxudist", "pallas_flat_mxudist"),
]:
    try:
        measure(tag, algo)
    except Exception as e:
        emit({"stage": tag, "algo": algo,
              "error": f"{type(e).__name__}: {str(e)[:300]}"})

# ---- (b) surgical stages at N=1024 -------------------------------------
env, eng, state0 = build("pallas_flat_exact")
eps = np.float32(1e-10)
types_f = jnp.asarray(env.agent_types, dtype=jnp.float32)
selfmask_np = _BIG * np.eye(N_AG, dtype=np.float32)


def prep_inputs(state):
    loc_x = state["loc_x"]
    loc_y = state["loc_y"]
    still = state["still_in_the_game"].astype(jnp.float32)
    t_norm = (state[_C.TIMESTEP] / env.episode_length).astype(jnp.float32)
    feats = jnp.stack(
        [loc_x / env.grid_diagonal,
         loc_y / env.grid_diagonal,
         state["speed"] / (env.max_speed + eps),
         state["acceleration"] / (env.max_speed + eps),
         state["direction"] / np.float32(2 * np.pi)],
        axis=1)
    xy2 = jnp.stack([loc_x, loc_y], axis=1)
    src = jnp.concatenate(
        [feats,
         jnp.broadcast_to(types_f[None, None, :], (E, 1, N_AG)),
         still[:, None, :],
         jnp.broadcast_to(t_norm[:, None, None], (E, 1, N_AG))],
        axis=1)
    cand = jnp.stack(
        [loc_x, loc_y, still] + [jnp.zeros_like(loc_x)] * 5, axis=2)
    feats6 = jnp.concatenate(
        [feats, jnp.broadcast_to(types_f[None, None, :], (E, 1, N_AG))],
        axis=1)
    hi = feats6.astype(jnp.bfloat16)
    lo = (feats6 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    pairs = jnp.pad(jnp.concatenate([hi, lo], axis=1),
                    ((0, 0), (0, 4), (0, 0)))
    return cand, pairs, jnp.asarray(selfmask_np), xy2, src


def k_io(cand_ref, pairs_ref, selfmask_ref, xy_ref, src_ref, out_ref):
    out_ref[:] = jnp.broadcast_to(src_ref[:], out_ref.shape)


def _dist(cand_ref, selfmask_ref, xy_ref):
    still_sub = cand_ref[:, :, 2:3]
    dead_big = (1.0 - still_sub) * _BIG
    maskmat = selfmask_ref[:][None, :, :] + dead_big
    x = xy_ref[:, 0, :]
    y = xy_ref[:, 1, :]
    dx = cand_ref[:, :, 0:1] - x[:, None, :]
    dy = cand_ref[:, :, 1:2] - y[:, None, :]
    d2 = dx * dx + dy * dy + maskmat
    return pltpu.bitcast(d2, jnp.int32)


def k_dist(cand_ref, pairs_ref, selfmask_ref, xy_ref, src_ref, out_ref):
    d2i = _dist(cand_ref, selfmask_ref, xy_ref)
    m = jnp.min(d2i, axis=1)
    out_ref[:] = jnp.broadcast_to(
        m.astype(jnp.float32)[:, None, :], out_ref.shape)


def k_ladder(cand_ref, pairs_ref, selfmask_ref, xy_ref, src_ref, out_ref):
    d2i = _dist(cand_ref, selfmask_ref, xy_ref)
    Bk = xy_ref.shape[0]
    row_j = jax.lax.broadcasted_iota(jnp.int32, (Bk, SUBn, LANE), 1)
    big_packed = np.int32(np.float32(_BIG).view(np.int32))
    acc = jnp.zeros((Bk, 1, LANE), jnp.float32)
    for _slot in range(K):
        m2 = jnp.min(d2i, axis=1, keepdims=True)
        t = jnp.where(d2i == m2, row_j, SUBn)
        mi = jnp.min(t, axis=1, keepdims=True)
        eq = t == mi
        acc = acc + mi.astype(jnp.float32)
        d2i = jnp.where(eq, big_packed, d2i)
    out_ref[:] = jnp.broadcast_to(acc, out_ref.shape)


def call_experiment(kern, state):
    cand, pairs, selfmask, xy2, src = prep_inputs(state)
    B = 1
    return pl.pallas_call(
        kern,
        grid=(E // B, NT),
        compiler_params=pltpu.CompilerParams(
            allow_input_fusion=[True] * 5),
        in_specs=[
            pl.BlockSpec((B, SUBn, 8), lambda e, t: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 16, SUBn), lambda e, t: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBn, LANE), lambda e, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2, LANE), lambda e, t: (e, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8, LANE), lambda e, t: (e, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 8, LANE), lambda e, t: (e, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, 8, NT * LANE), jnp.float32),
    )(cand, pairs, selfmask, xy2, src)


for tag, fn in [
    ("S_none_no_obs", None),
    ("S0_io", lambda s: call_experiment(k_io, s)),
    ("S1_dist_min", lambda s: call_experiment(k_dist, s)),
    ("S2_ladder", lambda s: call_experiment(k_ladder, s)),
]:
    try:
        key = jax.random.PRNGKey(9)
        t0 = time.time()
        st = rollout_rate_stats(make_step(env, eng, fn),
                                (state0, jnp.zeros(())), N_STEPS, E, key,
                                repeats=3)
        emit({"stage": tag,
              "median": round(st["value"]),
              "ms_per_step": round(1000.0 / st["value"] * E, 3),
              "min": round(st["min"]), "max": round(st["max"]),
              "n": st["n"], "wall_s": round(time.time() - t0, 1)})
    except Exception as e:
        emit({"stage": tag, "error": f"{type(e).__name__}: {str(e)[:300]}"})

print("AB11_DONE", flush=True)
