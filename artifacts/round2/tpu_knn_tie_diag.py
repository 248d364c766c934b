"""Diagnose the TPU kNN selection disagreement.

E1: all selection algorithms from ONE shared d2 tensor inside ONE program —
    if these agree, per-algorithm selection math is fine on TPU.
E2: passes-vs-passes across two differently-fused programs — detects
    cross-program d2 rounding (FMA contraction) differences.
E3: d2 bitwise across two programs.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

_BIG = np.float32(1e20)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def make_d2(loc_x, loc_y, alive):
    N = loc_x.shape[0]
    dx = loc_x[:, None] - loc_x[None, :]
    dy = loc_y[:, None] - loc_y[None, :]
    dist2 = dx * dx + dy * dy
    return jnp.where((jnp.eye(N, dtype=bool)) | (~alive)[None, :], _BIG,
                     dist2)


def sel_passes(d2, k):
    N = d2.shape[0]
    col_j = jnp.arange(N)[None, :]
    ams, valids = [], []
    for _ in range(k):
        m = jnp.min(d2, axis=1)
        am = jnp.argmin(d2, axis=1)
        valids.append(m < _BIG)
        ams.append(am)
        onehot = col_j == am[:, None]
        d2 = jnp.where(onehot, _BIG, d2)
    return jnp.stack(ams, 1), jnp.stack(valids, 1)


def sel_ladder(d2, k):
    N = d2.shape[0]
    col_j = jnp.arange(N)[None, :]
    prev_m = jnp.full((N, 1), -1.0, d2.dtype)
    prev_am = jnp.full((N, 1), -1, jnp.int32)
    ams, valids = [], []
    for _ in range(k):
        later = (d2 > prev_m) | ((d2 == prev_m) & (col_j > prev_am))
        cand = jnp.where(later, d2, _BIG)
        m = jnp.min(cand, axis=1)
        am = jnp.argmin(cand, axis=1)
        valids.append(m < _BIG)
        ams.append(am)
        prev_m = m[:, None]
        prev_am = am[:, None].astype(jnp.int32)
    return jnp.stack(ams, 1), jnp.stack(valids, 1)


def sel_packed(d2, k):
    N = d2.shape[0]
    col_j = jnp.arange(N)[None, :]
    b = max(1, int(N - 1).bit_length())
    low_mask = np.int32((1 << b) - 1)
    sentinel = np.int32(np.iinfo(np.int32).max)
    valid_max = np.int32(np.float32(1e18).view(np.int32))
    d2i = jnp.bitwise_or(
        jnp.bitwise_and(lax.bitcast_convert_type(d2, jnp.int32), ~low_mask),
        col_j)
    prev = jnp.full((N, 1), -1, jnp.int32)
    ams, valids = [], []
    for _ in range(k):
        m = jnp.min(jnp.where(d2i > prev, d2i, sentinel), axis=1)
        valids.append(m < valid_max)
        ams.append(jnp.bitwise_and(m, low_mask))
        prev = m[:, None]
    return jnp.stack(ams, 1), jnp.stack(valids, 1)


def sel_topk(d2, k):
    neg_vals, nbr_idx = lax.top_k(-d2, k)
    return nbr_idx.astype(jnp.int32), neg_vals > -_BIG


def main():
    emit(stage="start", platform=jax.devices()[0].platform)
    rng = np.random.default_rng(3)
    N, k, E = 105, 10, 64
    lx = rng.uniform(0, 20, (E, N)).astype(np.float32)
    ly = rng.uniform(0, 20, (E, N)).astype(np.float32)
    alive = rng.uniform(size=(E, N)) > 0.12

    # E1: shared d2, one program
    @jax.jit
    def e1(lx, ly, alive):
        d2 = jax.vmap(make_d2)(lx, ly, alive)
        outs = {}
        for name, fn in [("passes", sel_passes), ("ladder", sel_ladder),
                         ("packed", sel_packed), ("topk", sel_topk)]:
            outs[name] = jax.vmap(lambda d: fn(d, k))(d2)
        return outs

    outs = jax.device_get(e1(jnp.asarray(lx), jnp.asarray(ly),
                             jnp.asarray(alive)))
    ref_am, ref_v = outs["passes"]
    for name in ("ladder", "packed", "topk"):
        am, v = outs[name]
        # compare only valid slots
        mism = int(np.sum((am != ref_am) & ref_v & v))
        vmism = int(np.sum(v != ref_v))
        emit(stage="E1_shared_d2", algo=name, slot_mismatches=mism,
             valid_mismatches=vmism, total_slots=int(ref_v.size))

    # E2/E3: cross-program d2 + passes selection
    @jax.jit
    def prog_a(lx, ly, alive):
        d2 = jax.vmap(make_d2)(lx, ly, alive)
        return d2, jax.vmap(lambda d: sel_passes(d, k))(d2)

    @jax.jit
    def prog_b(lx, ly, alive):
        # same math, different surrounding program (extra consumer changes
        # fusion decisions)
        d2 = jax.vmap(make_d2)(lx, ly, alive)
        sel = jax.vmap(lambda d: sel_passes(d, k))(d2)
        aux = jnp.sum(jnp.sqrt(jnp.where(d2 < _BIG, d2, 0.0)))
        return d2, sel, aux

    d2a, (am_a, v_a) = jax.device_get(prog_a(jnp.asarray(lx),
                                             jnp.asarray(ly),
                                             jnp.asarray(alive)))
    d2b, (am_b, v_b), _ = jax.device_get(prog_b(jnp.asarray(lx),
                                                jnp.asarray(ly),
                                                jnp.asarray(alive)))
    emit(stage="E3_d2_bitwise_equal", equal=bool(np.array_equal(d2a, d2b)),
         n_diff=int(np.sum(d2a != d2b)),
         max_ulp=int(np.max(np.abs(d2a.view(np.int32).astype(np.int64)
                                   - d2b.view(np.int32).astype(np.int64))))
         if not np.array_equal(d2a, d2b) else 0)
    emit(stage="E2_passes_cross_program",
         am_equal=bool(np.array_equal(am_a, am_b)),
         slot_mismatches=int(np.sum(am_a != am_b)))

    # E4: numpy float64-free ground truth vs TPU passes (same f32 math)
    d2n = np.asarray(d2a)
    am_np = np.zeros_like(am_a)
    d2w = d2n.copy()
    for s in range(k):
        am_np[:, :, s] = np.argmin(d2w, axis=2)
        np.put_along_axis(d2w, am_np[:, :, s][:, :, None], _BIG, axis=2)
    emit(stage="E4_numpy_vs_tpu_passes",
         equal=bool(np.array_equal(am_np, am_a)),
         slot_mismatches=int(np.sum(am_np != am_a)))

    emit(stage="done")


if __name__ == "__main__":
    main()
