"""
WarpDrive-TPU: an end-to-end TPU-resident multi-agent reinforcement-learning
framework.

This is a from-scratch, TPU-native re-design of the capability set of
salesforce/warp-drive (the CUDA/PyTorch framework).  The entire RL loop --
environment simulation, action sampling, experience batching, and policy
training -- runs on TPU inside a single jitted program:

* environments are pure functions ``step(state, actions) -> state`` on JAX
  pytrees, vectorized across replicas with ``vmap`` (replacing per-thread CUDA
  kernels, cf. reference ``warp_drive/cuda_includes/core/``),
* rollouts run as a ``lax.scan`` over the training batch (replacing the
  Python-dispatch hot loop of reference ``trainer_base.py:383-428``),
* replicas shard across chips/hosts via ``jax.sharding`` meshes (replacing
  torch DDP + one-process-per-GPU, cf. reference
  ``training/utils/distributed_train/``),
* hot kernels beyond XLA's reach are written in Pallas.

Version history starts here; capability parity targets reference v2.7.1.
"""

__version__ = "0.1.0"

from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.data_feed import DataFeed
from warpdrive_tpu.utils.env_registrar import EnvironmentRegistrar, env_registrar


def __getattr__(name):
    """Lazy top-level conveniences (avoid importing jax-heavy modules on
    package import): ``EnvEngine``, ``TrainerA2C``, ``TrainerDDPG``,
    ``register_all_envs``, ``EnvironmentCPUvsTPU``."""
    if name == "EnvEngine":
        from warpdrive_tpu.envs.engine import EnvEngine

        return EnvEngine
    if name == "TrainerA2C":
        from warpdrive_tpu.training.trainer_a2c import TrainerA2C

        return TrainerA2C
    if name == "TrainerDDPG":
        from warpdrive_tpu.training.trainer_ddpg import TrainerDDPG

        return TrainerDDPG
    if name == "register_all_envs":
        from warpdrive_tpu.envs import register_all_envs

        return register_all_envs
    if name == "EnvironmentCPUvsTPU":
        from warpdrive_tpu.tools.consistency import EnvironmentCPUvsTPU

        return EnvironmentCPUvsTPU
    raise AttributeError(f"module 'warpdrive_tpu' has no attribute {name!r}")
