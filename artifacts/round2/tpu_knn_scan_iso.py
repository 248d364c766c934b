"""Isolate why pallas_call inside lax.scan is ~300x slower than standalone.

Variants (all: 2000 envs, 50-step scan, carry = (loc_x, loc_y, checksum)):
  scan_raw:      raw pallas_call on pre-padded carried arrays
  scan_wrapper:  full knn_observation wrapper (pad + kernel + transpose)
  scan_xla_obs:  the pure-XLA k-pass observe for reference
  loop_standalone: 50 sequential jitted standalone calls (no scan)
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
STEPS = 50
rows = ((8 * k + 1 + 7) // 8) * 8


def emit(**kw):
    print(json.dumps(kw), flush=True)


def time_it(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def raw_pallas(xy, src, B=8):
    kern = functools.partial(K._knn_obs_kernel_v2, n_agents=N, k=k)
    return pl.pallas_call(
        kern,
        grid=(E // B,),
        in_specs=[
            pl.BlockSpec((B, 2, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, rows, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((E, rows, LANE), jnp.float32),
    )(xy, src)


if __name__ == "__main__":
    emit(stage="start")
    rng = np.random.RandomState(0)
    xy = jnp.asarray(rng.uniform(0, 20, (E, 2, LANE)).astype(np.float32))
    src = jnp.asarray(rng.uniform(0, 1, (E, 8, LANE)).astype(np.float32))

    # 1. raw pallas in scan: carry the padded arrays, rotate them slightly
    #    each step so the scan can't hoist the call
    def body_raw(carry, _):
        xy, src, chk = carry
        out = raw_pallas(xy, src)
        chk = chk + out[0, 0, 0]
        xy = xy + 1e-6
        return (xy, src, chk), 0

    f = jax.jit(lambda c: jax.lax.scan(body_raw, c, None, length=STEPS)[0])
    dt = time_it(f, (xy, src, jnp.zeros(())))
    emit(stage="scan_raw", ms_per_step=round(dt / STEPS * 1000, 3))

    # 2. full wrapper in scan
    loc_x = jnp.asarray(rng.uniform(0, 20, (E, N)).astype(np.float32))
    loc_y = jnp.asarray(rng.uniform(0, 20, (E, N)).astype(np.float32))
    feats = jnp.asarray(rng.uniform(0, 1, (E, 5, N)).astype(np.float32))
    types = jnp.asarray(rng.randint(0, 2, (N,)).astype(np.float32))
    still = jnp.ones((E, N), jnp.float32)
    tn = jnp.zeros((E,), jnp.float32)

    def body_wrap(carry, _):
        lx, ly, chk = carry
        out = K.knn_observation(
            lx, ly, feats, types, still, tn, n_agents=N, k=k
        )
        chk = chk + out[0, 0, 0]
        return (lx + 1e-6, ly, chk), 0

    f = jax.jit(lambda c: jax.lax.scan(body_wrap, c, None, length=STEPS)[0])
    dt = time_it(f, (loc_x, loc_y, jnp.zeros(())))
    emit(stage="scan_wrapper", ms_per_step=round(dt / STEPS * 1000, 3))

    # 3. standalone jitted calls, Python loop (reference point)
    g = jax.jit(
        lambda lx: K.knn_observation(
            lx, loc_y, feats, types, still, tn, n_agents=N, k=k
        )
    )
    out = g(loc_x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(STEPS):
        out = g(loc_x + i * 1e-6)
    jax.block_until_ready(out)
    emit(
        stage="loop_standalone",
        ms_per_step=round((time.perf_counter() - t0) / STEPS * 1000, 3),
    )
    emit(stage="done")
