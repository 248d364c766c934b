"""
Done-driven auto-reset combinator.

This replaces the reference's generic CUDA reset kernels
(``cuda_includes/core/reset.cu:9-75``: ``reset_in_{float,int}_when_done_{2d,3d}``
and ``undo_done_flag_and_reset_timestep``) and the Numba pool-reset kernels
(``numba_includes/core/pool_reset.py:16-53``) with a single pure function over
the state pytree:

* every snapshot-flagged array is restored to its at-reset value for envs
  whose done flag is set,
* every pool-backed target instead receives a pool row sampled uniformly per
  env,
* done flags and timesteps of those envs are zeroed.

``force`` resets every env regardless of done flags (the reference's
``force_reset`` mode, ``function_manager.py:253-276``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from warpdrive_tpu.utils.constants import Constants


def _bcast(mask: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Reshape a per-env boolean mask to broadcast against an (env, ...) array."""
    return mask.reshape(mask.shape + (1,) * (ndim - 1))


def make_auto_reset_fn(snapshot: dict, pools: dict):
    """
    Build the pure auto-reset function for a given snapshot/pool registry.

    :param snapshot: name -> single-env at-reset value (restored on done).
    :param pools: target name -> (pool_size, *single_env_shape) candidate bank.
    :returns: ``auto_reset(state, key, force=False) -> state``.
    """
    snapshot = dict(snapshot)
    pools = dict(pools)

    def auto_reset(state: dict, key: jnp.ndarray, force: bool = False) -> dict:
        done = state[Constants.DONE] > 0
        if force:
            done = jnp.ones_like(done)
        new_state = dict(state)
        for name, snap in snapshot.items():
            if name not in state:
                # split-step fast path: derived arrays (e.g. observations)
                # are not carried through the rollout and need no restore
                continue
            cur = state[name]
            new_state[name] = jnp.where(_bcast(done, cur.ndim), snap[None], cur)
        if pools:
            num_envs = done.shape[0]
            pool_keys = jax.random.split(key, len(pools))
            for pool_key, (target, pool) in zip(pool_keys, sorted(pools.items())):
                cur = state[target]
                idx = jax.random.randint(
                    pool_key, (num_envs,), 0, pool.shape[0], dtype=jnp.int32
                )
                candidates = jnp.take(pool, idx, axis=0)
                new_state[target] = jnp.where(
                    _bcast(done, cur.ndim), candidates, cur
                )
        # undo_done_flag_and_reset_timestep (reference reset.cu:65-75)
        new_state[Constants.TIMESTEP] = jnp.where(
            done, 0, state[Constants.TIMESTEP]
        )
        new_state[Constants.DONE] = jnp.where(
            done, 0, state[Constants.DONE]
        ).astype(jnp.int32)
        return new_state

    return auto_reset
