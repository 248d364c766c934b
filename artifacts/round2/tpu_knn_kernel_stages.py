"""Find the slow part of the kNN Pallas kernel. Every stage is timed with
CHANGING inputs (defeats the runtime's identical-call caching that poisoned
earlier measurements).

Kernels (grid over env blocks, B envs per step):
  k_d2min:   d2 + pack + one min reduction + store      (baseline cost)
  k_ladder:  + full k-round ladder (min/eq/where), no selection
  k_select1: ladder + ONE channel selection per slot
  k_full:    the real v2 kernel (7 channel selections)
  k_full_b1: v2 with B=1, arrays squeezed to 2D (L, L)
  k_wrapper: pad/stack/transpose around a copy-through kernel (wrapper cost)
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

sys.path.insert(0, "/root/repo")
from warpdrive_tpu.ops import knn_obs as K  # noqa: E402

print("devices:", jax.devices(), flush=True)

E, N, k = 2000, 105, 10
LANE = K.LANE
rows = ((8 * k + 1 + 7) // 8) * 8
_BIG = K._BIG


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bench(make_fn, n_calls=20):
    """Time jitted fn over n_calls with a changing scalar input."""
    f = jax.jit(make_fn)
    out = f(jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n_calls + 1):
        out = f(jnp.float32(i * 1e-6))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_calls * 1000


rng = np.random.RandomState(0)
xy_np = rng.uniform(0, 20, (E, 2, LANE)).astype(np.float32)
src_np = rng.uniform(0, 1, (E, 8, LANE)).astype(np.float32)
xy0 = jnp.asarray(xy_np)
src0 = jnp.asarray(src_np)


def setup(xy_ref, src_ref, B):
    col_j = jax.lax.broadcasted_iota(jnp.int32, (B, LANE, LANE), 2)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (B, LANE, LANE), 1)
    x = xy_ref[:, 0, :]
    y = xy_ref[:, 1, :]
    src = src_ref[:]
    dx = x[:, :, None] - x[:, None, :]
    dy = y[:, :, None] - y[:, None, :]
    d2 = dx * dx + dy * dy
    invalid = (col_j >= N) | (col_j == row_i) | (src[:, 6:7, :] < 0.5)
    d2 = jnp.where(invalid, _BIG, d2)
    d2i = jnp.bitwise_or(
        jnp.bitwise_and(pltpu.bitcast(d2, jnp.int32), K._CLEAR_MASK), col_j
    )
    return d2i, src


def kern_d2min(xy_ref, src_ref, out_ref, *, B):
    d2i, src = setup(xy_ref, src_ref, B)
    m = jnp.min(d2i, axis=2)  # (B, LANE)
    out_ref[:, 0:1, :] = m.astype(jnp.float32)[:, None, :]
    out_ref[:, 1:, :] = jnp.zeros((B, rows - 1, LANE), jnp.float32)


def kern_ladder(xy_ref, src_ref, out_ref, *, B, n_sel):
    d2i, src = setup(xy_ref, src_ref, B)

    def chan(c):
        return src[:, c : c + 1, :]

    def slot_body(slot, d2i):
        m2 = jnp.min(d2i, axis=2, keepdims=True)
        eq = d2i == m2
        m = jax.lax.squeeze(m2, [2])
        valid = (m < K._VALID_MAX).astype(jnp.float32)
        pieces = [valid[:, None, :]]
        for c in range(n_sel):
            pieces.append(jnp.sum(jnp.where(eq, chan(c), 0.0), axis=2)[:, None, :])
        pieces.append(jnp.zeros((B, 8 - 1 - n_sel, LANE), jnp.float32))
        rows8 = jnp.concatenate(pieces, axis=1)
        out_ref[:, pl.ds(pl.multiple_of(slot * 8, 8), 8), :] = rows8
        return jnp.where(eq, K._BIG_PACKED, d2i)

    jax.lax.fori_loop(0, k, slot_body, d2i)
    out_ref[:, 8 * k :, :] = jnp.zeros((B, rows - 8 * k, LANE), jnp.float32)


def make_call(kern, B, **kw):
    kf = functools.partial(kern, B=B, **kw)

    def call(eps):
        xy = xy0 + eps
        return pl.pallas_call(
            kf,
            grid=(E // B,),
            in_specs=[
                pl.BlockSpec((B, 2, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 8, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B, rows, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((E, rows, LANE), jnp.float32),
        )(xy, src0)

    return call


def kern_full_b1(xy_ref, src_ref, out_ref):
    """B=1, 2D tiles: refs are (2, LANE), (8, LANE), (rows, LANE)."""
    col_j = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    x = xy_ref[0:1, :]
    y = xy_ref[1:2, :]
    src = src_ref[:]
    dx = jnp.transpose(x) - x  # (LANE, LANE): dx[i, j] = x[i] - x[j]
    dy = jnp.transpose(y) - y
    d2 = dx * dx + dy * dy
    invalid = (col_j >= N) | (col_j == row_i) | (src[6:7, :] < 0.5)
    d2 = jnp.where(invalid, _BIG, d2)
    d2i = jnp.bitwise_or(
        jnp.bitwise_and(pltpu.bitcast(d2, jnp.int32), K._CLEAR_MASK), col_j
    )

    def chan(c):
        return src[c : c + 1, :]

    def slot_body(slot, d2i):
        m2 = jnp.min(d2i, axis=1, keepdims=True)  # (LANE, 1)
        eq = d2i == m2
        m = jnp.transpose(m2)  # (1, LANE)
        valid = (m < K._VALID_MAX).astype(jnp.float32)
        nbr = [
            jnp.sum(jnp.where(eq, chan(c), 0.0), axis=1)[None, :]
            for c in range(7)
        ]
        gate = valid
        rows8 = jnp.concatenate(
            [(nbr[c] - chan(c)) * gate for c in range(5)]
            + [nbr[5] * gate, nbr[6] * gate, gate],
            axis=0,
        )
        out_ref[pl.ds(pl.multiple_of(slot * 8, 8), 8), :] = rows8
        return jnp.where(eq, K._BIG_PACKED, d2i)

    jax.lax.fori_loop(0, k, slot_body, d2i)
    out_ref[8 * k :, :] = jnp.zeros((rows - 8 * k, LANE), jnp.float32)


def call_b1(eps):
    xy = (xy0 + eps)
    return pl.pallas_call(
        kern_full_b1,
        grid=(E,),
        in_specs=[
            pl.BlockSpec((1, 2, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((E, rows, LANE), jnp.float32),
    )(
        xy.reshape(E, 1, 2, LANE).squeeze(1)[:, None][:, 0][:, None, :, :].squeeze(1),
        src0,
    )


if __name__ == "__main__":
    emit(stage="start")
    for B in (8,):
        emit(stage="k_d2min", B=B, ms=round(bench(make_call(kern_d2min, B)), 2))
        emit(stage="k_ladder", B=B,
             ms=round(bench(make_call(kern_ladder, B, n_sel=0)), 2))
        emit(stage="k_select1", B=B,
             ms=round(bench(make_call(kern_ladder, B, n_sel=1)), 2))
        emit(stage="k_full", B=B,
             ms=round(bench(make_call(kern_ladder, B, n_sel=7)), 2))
    emit(stage="done")
