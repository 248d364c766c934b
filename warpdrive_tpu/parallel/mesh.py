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
(``trainer_base.py:249-256``); here a single global seed drives one SPMD
program, so all replicas are reproducible by construction.  In a
multi-process run every process MUST use the identical seed: host-side
values (engine state, trainer carries, rng keys) are replicated program
inputs, and GSPMD semantics require them equal across processes — the
per-rank seed offsetting the reference needs is exactly the machinery
this design deletes.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"
MODEL_AXIS = "model"


def _put(x, sharding):
    """``jax.device_put`` that also works on CROSS-PROCESS shardings.

    In a multi-process run (``jax.distributed.initialize``), a sharding
    spans devices this process cannot address; the host value is then
    required to be IDENTICAL in every process (true here: engine state and
    trainer carries are built deterministically from the config seed), and
    the array is assembled from each process's addressable shards.
    """
    x = jax.numpy.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    try:
        return jax.device_put(x, sharding)
    except ValueError:
        # older device_put paths reject non-addressable shardings for
        # committed device arrays; rebuild from the host value per shard
        host = np.asarray(x)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )


def to_host(x) -> np.ndarray:
    """Host ``np.ndarray`` of a possibly CROSS-PROCESS ``jax.Array``.

    Single-process (and anything fully addressable): a plain
    ``np.asarray``.  In a multi-process run, replicated leaves (params,
    metrics scalars) read from the local shard; env-sharded leaves
    all-gather across processes (facade/logging convenience only — the
    hot paths never call this).
    """
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_addressable:
        return np.asarray(x)
    if x.is_fully_replicated:
        return np.asarray(x.addressable_data(0))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


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


def make_mesh_2d(dp: int, tp: int, devices=None) -> Mesh:
    """
    2-D ``(env, model)`` mesh: env replicas sharded over ``dp`` devices x
    model parameters sharded over ``tp`` devices (tensor parallelism —
    beyond reference parity, whose MLPs are tiny; useful once policies
    grow past one chip's HBM).
    """
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * tp, (
        f"need {dp * tp} devices for a {dp}x{tp} mesh, have {len(devices)}"
    )
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (ENV_AXIS, MODEL_AXIS))


def shard_params_tp(params, mesh: Mesh):
    """
    Tensor-parallel parameter placement: each weight tensor's largest
    axis divisible by the ``model`` axis size is sharded over it (column/
    row parallel Dense layers); XLA inserts the activation collectives.
    Tensors with no divisible axis stay replicated.
    """
    tp = mesh.shape[MODEL_AXIS]

    def place(x):
        x = jax.numpy.asarray(x)
        spec = [None] * x.ndim
        for ax in sorted(range(x.ndim), key=lambda a: -x.shape[a]):
            if x.shape[ax] % tp == 0 and x.shape[ax] >= tp:
                spec[ax] = MODEL_AXIS
                break
        return _put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(place, params)


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
            return _put(x, env_sharding(mesh, x.ndim))
        return _put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, dict(state))


# top-level carry keys holding model/optimizer pytrees (TrainerA2C /
# TrainerDDPG); on a 2-D mesh these get tensor-parallel placement
_PARAM_KEYS = (
    "params",
    "opt",
    "actor",
    "critic",
    "target_actor",
    "target_critic",
    "opt_actor",
    "opt_critic",
)


# top-level carry keys holding TIME-MAJOR replay subtrees (TrainerDDPG):
# (capacity, E, ...) — the env axis is dim 1, so the generic axis-0 rule
# below would REPLICATE the largest arrays in the carry onto every device
_REPLAY_KEYS = ("buf", "done_buf")


def shard_carry(carry, mesh: Mesh, num_envs: int):
    """
    Place a trainer carry on the mesh: env-batched leaves sharded over
    ``env``; on a 2-D mesh, model/optimizer subtrees sharded over
    ``model`` (tensor parallelism); time-major replay buffers sharded on
    their env axis (dim 1); everything else replicated.
    """
    has_tp = MODEL_AXIS in mesh.axis_names

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] == num_envs:
            return _put(x, env_sharding(mesh, x.ndim))
        return _put(x, replicated(mesh))

    def place_time_major(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 2 and x.shape[1] == num_envs:
            spec = P(None, ENV_AXIS, *([None] * (x.ndim - 2)))
            return _put(x, NamedSharding(mesh, spec))
        return place(x)

    if not isinstance(carry, dict):
        return jax.tree_util.tree_map(place, carry)

    out = {}
    for key, sub in carry.items():
        if has_tp and key in _PARAM_KEYS:
            out[key] = shard_params_tp(sub, mesh)
        elif key in _REPLAY_KEYS:
            out[key] = jax.tree_util.tree_map(place_time_major, sub)
        else:
            out[key] = jax.tree_util.tree_map(place, sub)
    return out


def apply_env_sharding(
    engine, num_devices: int = None, mesh: Mesh = None, tp: int = 1
):
    """
    Attach a mesh to an :class:`EnvEngine` and move its live state onto it.

    After this call the engine's ``state`` arrays are distributed; trainers
    detect ``engine.mesh`` and place their carries accordingly, so the whole
    jitted iteration runs SPMD over the mesh.

    :param tp: model-axis size; >1 builds a 2-D ``(env, model)`` mesh with
        tensor-parallel parameter placement in the trainers.
    """
    if mesh is None:
        if tp > 1:
            total = num_devices or len(jax.devices())
            assert total % tp == 0, f"{total} devices not divisible by tp={tp}"
            mesh = make_mesh_2d(dp=total // tp, tp=tp)
        else:
            mesh = make_mesh(num_devices=num_devices)
    n_shards = mesh.shape[ENV_AXIS]
    assert engine.n_envs % n_shards == 0, (
        f"num_envs={engine.n_envs} must divide evenly over {n_shards} "
        "env-axis shards"
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
