"""
Device meshes and env-axis sharding.

TPU-native replacement for the reference's entire multi-GPU stack —
one-process-per-GPU spawning (``training/utils/distributed_train/
distributed_trainer_pycuda.py:13-47``), gloo process groups
(``device_child_process/process_group_torch.py:6-20``), per-device CUDA
contexts (``single_device_context/``), and torch-DDP gradient allreduce
(``trainers/trainer_a2c.py:139-146``).

On TPU none of that machinery exists as code the user runs: we build a
``jax.sharding.Mesh`` over the chips, place every environment-state array
with its replica axis sharded over the mesh's ``env`` axis and every model
parameter replicated, and ``jax.jit`` compiles ONE SPMD program in which XLA
inserts the gradient ``psum`` over ICI automatically — the collective that
torch-DDP's hooks perform imperatively.  Scaling across hosts only changes
the mesh construction (``jax.distributed.initialize`` +
``jax.devices()`` spanning all processes); the training code is unchanged.

Determinism parity: the reference offsets the seed by device rank
(``trainer_base.py:249-256``); here a single global seed drives one
program, so all replicas are reproducible by construction, and multi-host
runs fold ``jax.process_index()`` into the seed at trainer level.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(num_devices: int = None, devices=None, axis_name: str = ENV_AXIS) -> Mesh:
    """
    Build a 1-D device mesh whose single axis shards the env-replica
    dimension (data parallelism — the only strategy the reference has,
    cf. SURVEY §2.3).

    :param num_devices: how many devices to use (default: all visible).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        assert len(devices) >= num_devices, (
            f"need {num_devices} devices, have {len(devices)}; on CPU set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N"
        )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def env_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Sharding that splits axis 0 (env replicas) over the mesh."""
    return NamedSharding(mesh, P(ENV_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated placement (model params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_state(state: dict, mesh: Mesh, num_envs: int) -> dict:
    """
    Place a batched env-state pytree on the mesh: every array whose leading
    axis is the env-replica axis is sharded over ``env``; anything else is
    replicated.
    """

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, env_sharding(mesh, x.ndim))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, dict(state))


def shard_carry(carry, mesh: Mesh, num_envs: int):
    """
    Place a trainer carry on the mesh with the same rule as
    :func:`shard_state`: env-batched leaves sharded, everything else
    (params, optimizer state, rng, scalar accumulators) replicated.
    """

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, env_sharding(mesh, x.ndim))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, carry)


def apply_env_sharding(engine, num_devices: int = None, mesh: Mesh = None):
    """
    Attach a mesh to an :class:`EnvEngine` and move its live state onto it.

    After this call the engine's ``state`` arrays are distributed; trainers
    detect ``engine.mesh`` and place their carries accordingly, so the whole
    jitted iteration runs SPMD over the mesh.
    """
    if mesh is None:
        mesh = make_mesh(num_devices=num_devices)
    n_shards = mesh.devices.size
    assert engine.n_envs % n_shards == 0, (
        f"num_envs={engine.n_envs} must divide evenly over {n_shards} devices"
    )
    engine.mesh = mesh
    engine.state = shard_state(engine.state, mesh, engine.n_envs)
    return engine


def initialize_multihost(coordinator_address: str = None, num_processes: int = None,
                         process_id: int = None):
    """
    Multi-host bring-up (replaces ``process_group_torch.py:6-20``): call once
    per host before building the mesh; afterwards ``jax.devices()`` spans the
    full slice and :func:`make_mesh` shards over hosts transparently, with
    gradient reductions riding ICI within a slice and DCN across slices.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
