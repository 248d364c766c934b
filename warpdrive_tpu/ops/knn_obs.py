"""
Fused k-nearest-neighbor observation kernel (Pallas TPU).

This is the hot op of TagContinuous's headline configuration (reference
``tag_continuous_step_pycuda.cu:295-468``: per-thread O(N) neighbor scans
with multi-block barriers; pure-XLA: pairwise distances + ``lax.top_k`` +
fancy-index gathers whose serial TPU lowering dominates the whole
simulation — ~57 ms/step at 2000 envs x 105 agents on v5e vs ~2 ms for all
of the physics).

The kernel fuses the entire observation build for a block of envs with
everything resident in VMEM and NO gathers:

1. squared pairwise distances from (x, y) — ordering needs no sqrt;
2. k passes of masked argmin (ascending distance, top_k order);
3. neighbor-feature selection as one-hot masked VPU reductions;
4. slot-major assembly (8 contiguous lanes per neighbor slot — zero
   cross-lane relayout) and a single HBM write of the obs block.

HBM traffic per step ≈ inputs (tiny) + the obs tensor itself — the
speed-of-light for this op.

Layout contract (matches ``TpuTagContinuous.observe_fn`` / the numpy
reference): agent i's row is, for each neighbor slot s in ascending
distance, ``[rel_x, rel_y, rel_speed, rel_acc, rel_dir, type, still,
valid]``, followed by the normalized timestep; invalid slots (fewer than k
alive others) and rows of out-of-game agents are zero.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.float32(1e20)

LANE = 128  # TPU lane width; the agent axis is padded to this


def _knn_obs_kernel(xy_ref, src_ref, out_ref, *, n_agents: int, k: int):
    """One grid step: a (B, ...) block of envs, fully batched.

    xy_ref:  (B, 2, LANE) f32 — loc_x, loc_y (world units)
    src_ref: (B, LANE, 8) f32 — per-agent channels
             [5 normalized features, type, still, t_norm]
    out_ref: (B, LANE, OBS_PAD) f32 — slot-major obs rows
    """
    B = xy_ref.shape[0]
    col_j = jax.lax.broadcasted_iota(jnp.int32, (B, LANE, LANE), 2)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (B, LANE, LANE), 1)

    x = xy_ref[:, 0, :]  # (B, LANE)
    y = xy_ref[:, 1, :]
    src = src_ref[:]  # (B, LANE, 8)
    still = src[:, :, 6]  # (B, LANE)

    dx = x[:, :, None] - x[:, None, :]
    dy = y[:, :, None] - y[:, None, :]
    d2 = dx * dx + dy * dy  # (B, LANE, LANE)

    invalid = (
        (col_j >= n_agents)
        | (col_j == row_i)
        | (still[:, None, :] < 0.5)
    )
    d2 = jnp.where(invalid, _BIG, d2)

    blocks = []
    for _slot in range(k):
        m = jnp.min(d2, axis=2)  # (B, LANE)
        valid = (m < _BIG).astype(jnp.float32)  # (B, LANE)
        # first index attaining the min, via min-reduction over masked
        # indices (Mosaic has no 3D argmin/gather lowering)
        cand = jnp.where(d2 <= m[:, :, None], col_j, LANE)
        am = jnp.min(cand, axis=2)  # (B, LANE); == LANE when no valid nbr

        onehot = (col_j == am[:, :, None]).astype(jnp.float32)  # (B,L,L)
        # one-hot select per channel: masked reduction over the lane axis
        # (gather-free; the selector is exact so no precision concerns)
        nbr = [
            jnp.sum(onehot * src[:, None, :, c], axis=2)  # (B, LANE)
            for c in range(7)
        ]
        rel = [
            (nbr[c] - src[:, :, c]) * valid for c in range(5)
        ]
        slot8 = jnp.stack(
            rel + [nbr[5] * valid, nbr[6] * valid, valid], axis=2
        )  # (B, LANE, 8)
        blocks.append(slot8)

        d2 = jnp.where(onehot > 0.5, _BIG, d2)

    blocks.append(src[:, :, 7:8])  # time channel
    pad_cols = out_ref.shape[2] - (8 * k + 1)
    if pad_cols:
        blocks.append(jnp.zeros((B, LANE, pad_cols), jnp.float32))
    obs = jnp.concatenate(blocks, axis=2)
    obs = obs * (still >= 0.5).astype(jnp.float32)[:, :, None]
    out_ref[:] = obs


@functools.partial(
    jax.jit, static_argnames=("n_agents", "k", "block_envs", "interpret")
)
def knn_observation(
    loc_x: jnp.ndarray,  # (E, N) world-unit positions
    loc_y: jnp.ndarray,  # (E, N)
    feats: jnp.ndarray,  # (E, 5, N) absolute normalized features
    types_f: jnp.ndarray,  # (N,)
    still_f: jnp.ndarray,  # (E, N)
    t_norm: jnp.ndarray,  # (E,)
    n_agents: int,
    k: int,
    block_envs: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused kNN observation: returns (E, N, 8*k + 1) float32."""
    E, N = loc_x.shape
    assert N == n_agents and n_agents <= LANE
    obs_dim = 8 * k + 1
    obs_pad = ((obs_dim + LANE - 1) // LANE) * LANE

    pad_n = LANE - N
    xy = jnp.stack(
        [
            jnp.pad(loc_x, ((0, 0), (0, pad_n))),
            jnp.pad(loc_y, ((0, 0), (0, pad_n))),
        ],
        axis=1,
    )  # (E, 2, LANE)
    src = jnp.concatenate(
        [
            jnp.pad(feats, ((0, 0), (0, 0), (0, pad_n))),
            jnp.pad(
                jnp.broadcast_to(types_f[None, None, :], (E, 1, N)),
                ((0, 0), (0, 0), (0, pad_n)),
            ),
            jnp.pad(still_f[:, None, :], ((0, 0), (0, 0), (0, pad_n))),
            jnp.broadcast_to(
                t_norm.astype(jnp.float32)[:, None, None], (E, 1, LANE)
            ),
        ],
        axis=1,
    ).transpose(0, 2, 1)  # (E, LANE, 8)

    B = block_envs
    pad_e = (-E) % B
    if pad_e:
        xy = jnp.pad(xy, ((0, pad_e), (0, 0), (0, 0)))
        src = jnp.pad(src, ((0, pad_e), (0, 0), (0, 0)))
    Ep = E + pad_e

    kernel = functools.partial(_knn_obs_kernel, n_agents=n_agents, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(Ep // B,),
        in_specs=[
            pl.BlockSpec((B, 2, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, LANE, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, LANE, obs_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Ep, LANE, obs_pad), jnp.float32),
        interpret=interpret,
    )(xy, src)

    return out[:E, :N, :obs_dim]
