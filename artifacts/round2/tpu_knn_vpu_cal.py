"""Calibrate Mosaic VPU throughput for the kNN kernel's op shapes.

All stages use changing inputs (defeats runtime result caching).

  bw_fma_3d / bw_fma_2d: 40 FMA passes over a VMEM-resident block —
      pure VPU rate on (8,128,128) 3D vs (1024,128) 2D layouts.
  min_3d / min_2d: 40 lane-axis min reductions.
  d2min_scratch: d2+pack+min with scratch-ref d2i (no fori carry).
  ladder_scratch: full 10-slot ladder + 7 selections, d2i mutated in a
      scratch ref instead of a fori carry (tests carry-copy overhead).
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
LANE = 128
B = 8
rows = 88
REP = 40


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bench(call, n_calls=10):
    f = jax.jit(call)
    out = f(jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n_calls + 1):
        out = f(jnp.float32(i * 1e-6))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_calls * 1000


rng = np.random.RandomState(0)
xy0 = jnp.asarray(rng.uniform(0, 20, (E, 2, LANE)).astype(np.float32))
src0 = jnp.asarray(rng.uniform(0, 1, (E, 8, LANE)).astype(np.float32))


def pallas_one_out(kern, out_rows, in3=True):
    def call(eps):
        xy = xy0 + eps
        return pl.pallas_call(
            kern,
            grid=(E // B,),
            in_specs=[
                pl.BlockSpec((B, 2, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 8, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B, out_rows, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((E, out_rows, LANE), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, LANE, LANE), jnp.int32),
                            pltpu.VMEM((B, LANE, LANE), jnp.float32)],
        )(xy, src0)

    return call


# ---------------- pure-FMA calibration ----------------
def kern_fma_3d(xy_ref, src_ref, out_ref, s_i, s_f):
    x = xy_ref[:, 0, :]
    a = x[:, :, None] * x[:, None, :]  # (B, L, L) materialize once
    s_f[:] = a

    def body(i, y):
        return y * 1.000001 + 0.5

    y = jax.lax.fori_loop(0, REP, body, s_f[:])
    out_ref[:, 0:1, :] = jnp.max(y, axis=2)[:, None, :]


def kern_min_3d(xy_ref, src_ref, out_ref, s_i, s_f):
    x = xy_ref[:, 0, :]
    s_f[:] = x[:, :, None] * x[:, None, :]

    def body(i, acc):
        return acc + jnp.min(s_f[:] + acc[:, :, None] * 0.0 + i, axis=2)

    acc = jax.lax.fori_loop(0, REP, body, jnp.zeros((B, LANE), jnp.float32))
    out_ref[:, 0:1, :] = acc[:, None, :]


# ---------------- scratch-based d2min and full ladder ----------------
def _setup_scratch(xy_ref, src_ref, s_i):
    col_j = jax.lax.broadcasted_iota(jnp.int32, (B, LANE, LANE), 2)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (B, LANE, LANE), 1)
    x = xy_ref[:, 0, :]
    y = xy_ref[:, 1, :]
    src = src_ref[:]
    dx = x[:, :, None] - x[:, None, :]
    dy = y[:, :, None] - y[:, None, :]
    d2 = dx * dx + dy * dy
    invalid = (col_j >= N) | (col_j == row_i) | (src[:, 6:7, :] < 0.5)
    d2 = jnp.where(invalid, K._BIG, d2)
    s_i[:] = jnp.bitwise_or(
        jnp.bitwise_and(pltpu.bitcast(d2, jnp.int32), K._CLEAR_MASK), col_j
    )
    return src


def kern_d2min_scratch(xy_ref, src_ref, out_ref, s_i, s_f):
    _setup_scratch(xy_ref, src_ref, s_i)
    m = jnp.min(s_i[:], axis=2)
    out_ref[:, 0:1, :] = m.astype(jnp.float32)[:, None, :]


def kern_ladder_scratch(xy_ref, src_ref, out_ref, s_i, s_f):
    src = _setup_scratch(xy_ref, src_ref, s_i)

    def chan(c):
        return src[:, c : c + 1, :]

    def slot_body(slot, _):
        d2i = s_i[:]
        m2 = jnp.min(d2i, axis=2, keepdims=True)
        eq = d2i == m2
        m = jax.lax.squeeze(m2, [2])
        valid = (m < K._VALID_MAX).astype(jnp.float32)
        nbr = [
            jnp.sum(jnp.where(eq, chan(c), 0.0), axis=2) for c in range(7)
        ]
        gate = valid[:, None, :]
        rows8 = jnp.concatenate(
            [(nbr[c][:, None, :] - chan(c)) * gate for c in range(5)]
            + [nbr[5][:, None, :] * gate, nbr[6][:, None, :] * gate, gate],
            axis=1,
        )
        out_ref[:, pl.ds(pl.multiple_of(slot * 8, 8), 8), :] = rows8
        s_i[:] = jnp.where(eq, K._BIG_PACKED, d2i)
        return 0

    jax.lax.fori_loop(0, k, slot_body, 0)
    out_ref[:, 8 * k :, :] = jnp.zeros((B, rows - 8 * k, LANE), jnp.float32)


# ---------------- monotonic ladder: no rewrite, carry only the min ------
def kern_ladder_mono(xy_ref, src_ref, out_ref, s_i, s_f):
    src = _setup_scratch(xy_ref, src_ref, s_i)
    d2i = s_i[:]

    def chan(c):
        return src[:, c : c + 1, :]

    IMIN = jnp.int32(-2147483648)
    IMAX = jnp.int32(2147483647)

    def slot_body(slot, m_prev):
        masked = jnp.where(d2i > m_prev, d2i, IMAX)
        m2 = jnp.min(masked, axis=2, keepdims=True)
        eq = d2i == m2
        m = jax.lax.squeeze(m2, [2])
        valid = (m < K._VALID_MAX).astype(jnp.float32)
        nbr = [
            jnp.sum(jnp.where(eq, chan(c), 0.0), axis=2) for c in range(7)
        ]
        gate = valid[:, None, :]
        rows8 = jnp.concatenate(
            [(nbr[c][:, None, :] - chan(c)) * gate for c in range(5)]
            + [nbr[5][:, None, :] * gate, nbr[6][:, None, :] * gate, gate],
            axis=1,
        )
        out_ref[:, pl.ds(pl.multiple_of(slot * 8, 8), 8), :] = rows8
        return m2

    jax.lax.fori_loop(
        0, k, slot_body, jnp.full((B, LANE, 1), IMIN, jnp.int32)
    )
    out_ref[:, 8 * k :, :] = jnp.zeros((B, rows - 8 * k, LANE), jnp.float32)


if __name__ == "__main__":
    emit(stage="start")
    for name, kern, orows in (
        ("bw_fma_3d", kern_fma_3d, 8),
        ("min_3d", kern_min_3d, 8),
        ("d2min_scratch", kern_d2min_scratch, 8),
        ("ladder_scratch", kern_ladder_scratch, rows),
        ("ladder_mono", kern_ladder_mono, rows),
    ):
        try:
            ms = bench(pallas_one_out(kern, orows))
            extra = {}
            if name == "bw_fma_3d":
                gbps = REP * E * LANE * LANE * 4 / (ms / 1000) / 1e9
                extra = {"fma_read_GBps": round(gbps)}
            if name == "min_3d":
                gbps = REP * E * LANE * LANE * 4 / (ms / 1000) / 1e9
                extra = {"min_read_GBps": round(gbps)}
            emit(stage=name, ms=round(ms, 2), **extra)
        except Exception as e:  # noqa: BLE001
            emit(stage=name, error=f"{type(e).__name__}: {str(e)[:200]}")
    emit(stage="done")
