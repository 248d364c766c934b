"""Round-5 A/B #9: surgical decomposition of the v9 flat_exact kernel at
the HEADLINE config (E=1000, B=4, input fusion) — the component table
VERDICT r4 next #1 requires.

Experiment-only kernels (not library code), each embedded in the SAME
env-only scan as the production path (random actions + physics + reset,
fresh keys per step — no chained-perturbation memoization hazard), so
each measurement is the production pipeline with the obs op replaced by
a stripped stage:

  S_none:    obs op removed entirely          -> physics+reset+randint+scan
  S0  io:    copy an input slab to a small out -> + launch/DMA floor
  S0b io_out: io + full flat-size out write    -> + out-write cost
  S1  dist:  masked d2 build + one min         -> + distance build
  S2  ladder: + full k-slot exact ladder (no acc stores)
  S2b acc:   + the bf16 one-hot acc stores
  S3  full:  the production flat_exact kernel (raw consumption)
  S4  prod:  knn_observation contract path (sum-consumed)
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
from warpdrive_tpu.presets import build_flagship  # noqa: E402
from warpdrive_tpu.ops.knn_obs import (  # noqa: E402
    LANE, _BIG, _VALID_MAX, knn_observation,
)
from warpdrive_tpu.utils.constants import Constants as _C  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab9_results.jsonl"
E, B, N_AG, K = 1000, 4, 105, 10
N_STEPS = 500


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


sys_ = build_flagship(num_envs=E, fc_dims=(256, 256), seed=0)
env = sys_["env"]
env.knn_input_fusion = True
engine = sys_["engine"]
heads = [int(n) for n in env.action_space[0].nvec]
types_f = jnp.asarray(env.agent_types, dtype=jnp.float32)
eps = np.float32(1e-10)

SUBn = ((N_AG + 7) // 8) * 8
NP_ = LANE  # one observer tile at N=105
OBS_COLS = (K + 1) * LANE

selfmask_np = np.pad(
    _BIG * np.eye(N_AG, dtype=np.float32),
    ((0, SUBn - N_AG), (0, NP_ - N_AG)),
)


def prep_inputs(state):
    """The flat dispatcher's input prep (mirrors _knn_observation_flat)."""
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
    pad_i = NP_ - N_AG
    pad_lane = lambda a: jnp.pad(  # noqa: E731
        a, ((0, 0),) * (a.ndim - 1) + ((0, pad_i),))
    xy2 = pad_lane(jnp.stack([loc_x, loc_y], axis=1))
    src = pad_lane(jnp.concatenate(
        [feats,
         jnp.broadcast_to(types_f[None, None, :], (E, 1, N_AG)),
         still[:, None, :],
         jnp.broadcast_to(t_norm[:, None, None], (E, 1, N_AG))],
        axis=1))
    pad_j = SUBn - N_AG
    cand = jnp.pad(
        jnp.stack([loc_x, loc_y, still] + [jnp.zeros_like(loc_x)] * 5,
                  axis=2),
        ((0, 0), (0, pad_j), (0, 0)))
    feats6 = jnp.concatenate(
        [feats, jnp.broadcast_to(types_f[None, None, :], (E, 1, N_AG))],
        axis=1)
    hi = feats6.astype(jnp.bfloat16)
    lo = (feats6 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    pairs = jnp.pad(jnp.concatenate([hi, lo], axis=1),
                    ((0, 0), (0, 4), (0, pad_j)))
    selfmask = jnp.asarray(selfmask_np)
    return cand, pairs, selfmask, xy2, src


# ---- experiment kernels -------------------------------------------------

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
    m = jnp.min(d2i, axis=1)  # (B, LANE)
    out_ref[:] = jnp.broadcast_to(
        m.astype(jnp.float32)[:, None, :], out_ref.shape)


def _ladder(d2i, Bk, store, acc_ref=None):
    row_j = jax.lax.broadcasted_iota(jnp.int32, (Bk, SUBn, LANE), 1)
    big_packed = np.int32(np.float32(_BIG).view(np.int32))

    def slot_body(slot, carry):
        d2i, acc = carry
        m2 = jnp.min(d2i, axis=1, keepdims=True)
        t = jnp.where(d2i == m2, row_j, SUBn)
        mi = jnp.min(t, axis=1, keepdims=True)
        eq = t == mi
        if store:
            acc_ref[:, :, pl.ds(pl.multiple_of(slot * LANE, LANE), LANE)] = (
                eq.astype(jnp.bfloat16))
            acc = acc
        else:
            acc = acc + mi.astype(jnp.float32)
        return jnp.where(eq, big_packed, d2i), acc

    _, acc = jax.lax.fori_loop(
        0, K, slot_body,
        (d2i, jnp.zeros((Bk, 1, LANE), jnp.float32)))
    return acc


def k_ladder(cand_ref, pairs_ref, selfmask_ref, xy_ref, src_ref, out_ref):
    d2i = _dist(cand_ref, selfmask_ref, xy_ref)
    acc = _ladder(d2i, xy_ref.shape[0], store=False)
    out_ref[:] = jnp.broadcast_to(acc, out_ref.shape)


def k_ladder_store(cand_ref, pairs_ref, selfmask_ref, xy_ref, src_ref,
                   out_ref, acc_ref):
    d2i = _dist(cand_ref, selfmask_ref, xy_ref)
    _ladder(d2i, xy_ref.shape[0], store=True, acc_ref=acc_ref)
    out_ref[:] = jnp.broadcast_to(
        acc_ref[:, 0:1, 0:LANE].astype(jnp.float32), out_ref.shape)


def call_experiment(kern, state, out_cols, scratch=False):
    cand, pairs, selfmask, xy2, src = prep_inputs(state)
    return pl.pallas_call(
        kern,
        grid=(E // B, 1),
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
        out_specs=pl.BlockSpec((B, 8, out_cols), lambda e, t: (e, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, 8, out_cols), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((B, SUBn, K * LANE), jnp.bfloat16)]
            if scratch else []),
    )(cand, pairs, selfmask, xy2, src)


def make_step(obs_fn):
    n_agents = engine.n_agents

    def step(carry, key):
        state, checksum = carry
        k_act, k_reset = jax.random.split(key)
        mins = jnp.zeros((len(heads),), dtype=jnp.int32)
        maxs = jnp.asarray(heads, dtype=jnp.int32)
        actions = jax.random.randint(
            k_act, (E, n_agents, len(heads)), mins, maxs, dtype=jnp.int32)
        if obs_fn is not None:
            checksum = checksum + obs_fn(state).sum()
        state = engine.step_physics(state, actions)
        return engine.auto_reset(state, k_reset), checksum

    return step


def measure(tag, obs_fn):
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    st = rollout_rate_stats(
        make_step(obs_fn), (sys_["state"], jnp.zeros(())),
        N_STEPS, E, key, repeats=5)
    ms = 1.0 / st["value"] * E * 1000.0
    emit({"stage": tag, "median_rate": round(st["value"]),
          "ms_per_step_per_1000envs": round(ms * 1000 / E, 4),
          "min": round(st["min"]), "max": round(st["max"]), "n": st["n"],
          "wall_s": round(time.time() - t0, 1)})


STAGES = [
    ("S_none_no_obs", None),
    ("S0_io", lambda s: call_experiment(k_io, s, LANE)),
    ("S0b_io_fullout", lambda s: call_experiment(k_io, s, OBS_COLS)),
    ("S1_dist_min", lambda s: call_experiment(k_dist, s, LANE)),
    ("S2_ladder", lambda s: call_experiment(k_ladder, s, LANE)),
    ("S2b_ladder_accstore",
     lambda s: call_experiment(k_ladder_store, s, LANE, scratch=True)),
    ("S3_full_raw", lambda s: env.observe_batch_fn(s)),  # prod contract
]

for tag, fn in STAGES:
    try:
        measure(tag, fn)
    except Exception as e:
        emit({"stage": tag, "error": f"{type(e).__name__}: {str(e)[:300]}"})

print("AB9_DONE", flush=True)
