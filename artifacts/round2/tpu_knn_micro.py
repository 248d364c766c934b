"""Micro-profile the Pallas kNN kernel: isolate pre-padding, the kernel
body, and the post-transpose; sweep k and grid shape to find the cliff."""

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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def time_it(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


E, N, k = 2000, 105, 10
LANE = K.LANE
rng = np.random.RandomState(0)
xy = jnp.asarray(rng.uniform(0, 20, (E, 2, LANE)).astype(np.float32))
src = jnp.asarray(rng.uniform(0, 1, (E, 8, LANE)).astype(np.float32))
obs_rows_pad = ((8 * k + 1 + 7) // 8) * 8


def raw_call(B, kk, variant="packed"):
    kern = functools.partial(
        K._knn_obs_kernel_v2 if variant == "packed" else K._knn_obs_kernel,
        n_agents=N,
        k=kk,
    )
    rows = ((8 * kk + 1 + 7) // 8) * 8

    @jax.jit
    def f(xy, src):
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

    return f


if __name__ == "__main__":
    emit(stage="start")

    # kernel body alone (no wrapper): B x k x variant sweep
    for variant in ("packed", "onehot"):
        for B in (2, 8, 16):
            for kk in (1, 2, 10):
                try:
                    dt = time_it(raw_call(B, kk, variant), xy, src)
                    emit(stage="raw_kernel", variant=variant, B=B, k=kk,
                         ms=round(dt * 1000, 3))
                except Exception as e:  # noqa: BLE001
                    emit(stage="raw_kernel", variant=variant, B=B, k=kk,
                         error=f"{type(e).__name__}: {str(e)[:150]}")

    # post-transpose alone
    out = jnp.zeros((E, obs_rows_pad, LANE), jnp.float32)
    tr = jax.jit(lambda o: jnp.swapaxes(o[:, : 8 * k + 1, :N], 1, 2))
    emit(stage="post_transpose", ms=round(time_it(tr, out) * 1000, 3))

    # wrapper end-to-end for reference
    loc = jnp.asarray(rng.uniform(0, 20, (E, N)).astype(np.float32))
    feats = jnp.asarray(rng.uniform(0, 1, (E, 5, N)).astype(np.float32))
    types = jnp.asarray(rng.randint(0, 2, (N,)).astype(np.float32))
    still = jnp.ones((E, N), jnp.float32)
    tn = jnp.zeros((E,), jnp.float32)
    for B in (2, 8, 16):
        f = jax.jit(
            lambda *a, b=B: K.knn_observation(
                *a, n_agents=N, k=k, block_envs=b
            )
        )
        dt = time_it(f, loc, loc, feats, types, still, tn)
        emit(stage="wrapper", B=B, ms=round(dt * 1000, 3))
    emit(stage="done")
