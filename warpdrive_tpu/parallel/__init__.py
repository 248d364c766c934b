"""Multi-chip / multi-host parallelism: device meshes and sharding rules."""

from warpdrive_tpu.parallel.mesh import (
    apply_env_sharding,
    make_mesh,
    shard_carry,
    shard_state,
)
