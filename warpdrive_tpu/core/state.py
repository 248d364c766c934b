"""
The StateStore: a named, batched, functional environment-state registry.

This is the TPU-native replacement for the reference's ``CUDADataManager``
(reference ``warp_drive/managers/data_manager.py:17-485``).  Where the
reference keeps a registry of raw device pointers shared between CUDA kernels
and torch tensors, here the environment state is a single JAX pytree
(``dict[str, jnp.ndarray]``) whose every array carries the env-replica axis
first.  Pushing data:

* casts to 32-bit types exactly like the reference
  (``data_manager.py:243-269``): float64->float32, int64->int32, bool->int32;
* replicates single-env arrays across the replica axis;
* snapshots arrays flagged ``save_copy_and_apply_at_reset`` so done-driven
  resets can restore them (the reference's ``<name>_at_reset`` copies,
  ``data_manager.py:282-305``);
* keeps scalars host-side as python numbers ("meta"), which the XLA compiler
  constant-folds into the step program (the reference passes them as kernel
  launch args, ``data_manager.py:342-359``);
* registers reset pools mapping a target array to a bank of candidate reset
  values (``data_manager.py:231-241``).

Built-in entries (cf. ``data_manager.py:75-105``): ``_done_`` (int32 per env,
0 = running, 1 = terminated, 2 = terminated-with-success),
``_timestep_`` (int32 per env) and ``_rng_`` (a per-env PRNG key for
stochastic env dynamics).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.data_feed import DataFeed


def cast_to_32bit(arr: np.ndarray) -> np.ndarray:
    """64-bit -> 32-bit, bool -> int32 (reference ``data_manager.py:243-269``)."""
    arr = np.asarray(arr)
    if arr.dtype in (np.float64, np.float16):
        return arr.astype(np.float32)
    if arr.dtype == np.int64:
        return arr.astype(np.int32)
    if arr.dtype == np.bool_:
        return arr.astype(np.int32)
    return arr


class StateStore:
    """
    Owns the batched env-state pytree, its at-reset snapshots, reset pools,
    meta scalars and episode-log registration.
    """

    def __init__(
        self,
        num_envs: int,
        num_agents: int,
        episode_length: int,
        seed: int = 0,
    ):
        assert num_envs > 0 and num_agents > 0 and episode_length > 0
        self.num_envs = int(num_envs)
        self.num_agents = int(num_agents)
        self.episode_length = int(episode_length)

        # meta scalars available to step functions as python constants
        self.meta = {
            "n_envs": self.num_envs,
            "n_agents": self.num_agents,
            "episode_length": self.episode_length,
            "seed": int(seed),
        }

        # name -> batched jnp array (leading axis = env replica)
        self.state: dict = {}
        # name -> SINGLE-env snapshot (jnp) restored on done
        self.snapshot: dict = {}
        # target name -> pool array (pool_size, *single_env_shape)
        self.pools: dict = {}
        # names with dense per-timestep episode logging
        self.log_names: list = []
        # name -> dtype/shape bookkeeping (single-env shape)
        self._specs: dict = {}

        # Built-ins (cf. reference data_manager.py:75-105): done flag,
        # timestep, and a per-env RNG key derived from the seed.
        self.state[Constants.DONE] = jnp.zeros((self.num_envs,), dtype=jnp.int32)
        self.state[Constants.TIMESTEP] = jnp.zeros((self.num_envs,), dtype=jnp.int32)
        base = jax.random.PRNGKey(int(seed))
        self.state[Constants.RNG] = jax.random.split(base, self.num_envs)

    # ------------------------------------------------------------------ push
    def push(self, data_feed: DataFeed, batched: bool = False):
        """
        Push a DataFeed into the store.

        :param batched: if True, array entries already carry the env axis
            (shape ``(num_envs, ...)``); otherwise single-env data is
            replicated across replicas (the reference replicates on first
            reset, ``env_wrapper.py:288-332``).
        """
        for name, entry in data_feed.items():
            data = entry["data"]
            if entry.get("is_reset_pool"):
                self._add_reset_pool(name, entry)
                continue
            if np.isscalar(data) or (
                isinstance(data, np.ndarray) and data.ndim == 0
            ):
                # Scalars stay host-side and become jit-time constants.
                value = np.asarray(data)
                if value.dtype == np.float64:
                    value = value.astype(np.float32)
                self.meta[name] = value.item()
                continue

            arr = cast_to_32bit(np.asarray(data))
            if batched:
                assert arr.shape[0] == self.num_envs, (
                    f"{name}: expected leading env axis {self.num_envs}, "
                    f"got {arr.shape}"
                )
                single_shape = arr.shape[1:]
                batched_arr = jnp.asarray(arr)
                single = jnp.asarray(arr[0])
            else:
                single_shape = arr.shape
                single = jnp.asarray(arr)
                batched_arr = jnp.broadcast_to(
                    single[None], (self.num_envs,) + arr.shape
                )
            assert name not in self.state, f"array {name!r} already on store"
            self.state[name] = batched_arr
            self._specs[name] = {"shape": single_shape, "dtype": str(arr.dtype)}

            if entry.get("save_copy_and_apply_at_reset"):
                self.snapshot[name] = single
            if entry.get("log_data_across_episode"):
                self.log_names.append(name)

    def _add_reset_pool(self, name: str, entry: dict):
        target = entry["reset_target"]
        pool = cast_to_32bit(np.asarray(entry["data"]))
        assert target is not None
        # Shape/dtype security check mirroring reference
        # ``numba_function_manager.py:430-476``.
        if target in self._specs:
            spec = self._specs[target]
            assert tuple(pool.shape[1:]) == tuple(spec["shape"]), (
                f"reset pool {name!r}: trailing shape {pool.shape[1:]} does not "
                f"match target {target!r} shape {spec['shape']}"
            )
            assert str(pool.dtype) == spec["dtype"], (
                f"reset pool {name!r}: dtype {pool.dtype} != target "
                f"{spec['dtype']}"
            )
        assert target not in self.pools, f"target {target!r} already has a pool"
        self.pools[target] = jnp.asarray(pool)

    # ----------------------------------------------------------------- query
    def is_on_device(self, name: str) -> bool:
        return name in self.state

    def get_shape(self, name: str):
        return tuple(self.state[name].shape)

    def get_dtype(self, name: str):
        return self.state[name].dtype

    def reset_pool(self, target: str):
        return self.pools[target]

    def pull(self, name: str) -> np.ndarray:
        """Device -> host copy of one array (reference ``pull_data_from_device``)."""
        return np.asarray(self.state[name])

    def names(self):
        return list(self.state.keys())
