"""
Worker for the real multi-process distributed test (NOT a pytest module).

Launched as::

    python tests/multiproc_worker.py <coordinator> <num_processes> \
        <process_id> <outdir>

with ``JAX_PLATFORMS=cpu`` and ``XLA_FLAGS=--xla_force_host_platform_
device_count=4`` in the environment: two such processes form a 2-process x
4-device cluster (8 global devices) — the CPU stand-in for the reference's
one-process-per-GPU distributed launch (``distributed_trainer_pycuda.py:
13-47`` + ``process_group_torch.py:6-20``), exercising the REAL
cross-process code path: ``jax.distributed`` rendezvous, a process-spanning
mesh, cross-process gradient psums, and lead-process-only outputs.
"""

import json
import os
import sys


def main():
    coordinator, num_processes, process_id, outdir = sys.argv[1:5]
    num_processes, process_id = int(num_processes), int(process_id)

    import jax

    from warpdrive_tpu.parallel.mesh import (
        apply_env_sharding,
        initialize_multihost,
        to_host,
    )

    initialize_multihost(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == 4 * num_processes, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import jax.numpy as jnp
    import numpy as np

    from warpdrive_tpu.envs import register_all_envs
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    register_all_envs()
    engine = EnvEngine(
        env_name="ClassicControlCartPoleEnv",
        env_config={"episode_length": 20, "reset_pool_size": 0, "seed": 4},
        num_envs=16,
        seed=3,
    )
    engine = apply_env_sharding(engine)  # mesh spans BOTH processes
    assert engine.mesh.devices.size == 4 * num_processes

    cfg = {
        "name": "multiproc_cartpole",
        "env": {},
        "trainer": {
            "num_envs": 16,
            "num_episodes": 16 * 4,
            "train_batch_size": 16 * 20,
            "seed": 7,
        },
        "policy": {
            "shared": {
                "to_train": True,
                "algorithm": "A2C",
                "gamma": 0.98,
                "lr": 0.01,
                "model": {"type": "fully_connected", "fc_dims": [16]},
            }
        },
        "saving": {
            "metrics_log_freq": 2,
            "model_params_save_freq": 10**9,
            "basedir": outdir,
            "name": "mp",
            "tag": "t",
        },
    }
    trainer = TrainerA2C(
        env_wrapper=engine,
        config=cfg,
        policy_tag_to_agent_id_map={"shared": list(range(1))},
        verbose=False,
        results_dir=os.path.join(outdir, "results"),
    )

    print(f"[worker {process_id}] trainer built", flush=True)
    # deterministic parity segment: 3 hot iterations from the initial carry
    carry = trainer._carry
    for i in range(3):
        carry, _ = trainer._iteration_fn_fast(
            carry, jnp.asarray(float(i), jnp.float32)
        )
    print(f"[worker {process_id}] fast iterations done", flush=True)
    params_host = jax.tree_util.tree_map(
        to_host, carry["params"]  # replicated -> local shard readable
    )
    print(f"[worker {process_id}] params_host pulled", flush=True)
    trainer._carry = carry

    # end-to-end segment: the real train() loop (metrics log + final
    # checkpoint, lead-process-only writes)
    trainer.train()
    print(f"[worker {process_id}] train() done", flush=True)

    if jax.process_index() == 0:
        flat, _ = jax.tree_util.tree_flatten(params_host)
        np.savez(os.path.join(outdir, "params_p0.npz"), *flat)
        with open(os.path.join(outdir, "ok_p0.json"), "w") as f:
            json.dump(
                {
                    "process_count": jax.process_count(),
                    "device_count": jax.device_count(),
                    "iters_completed": trainer.iters_completed,
                },
                f,
            )
    else:
        # non-lead process must NOT have written checkpoints/results
        with open(os.path.join(outdir, f"ok_p{process_id}.json"), "w") as f:
            json.dump({"process_count": jax.process_count()}, f)

    print(f"[worker {process_id}] outputs written; shutting down", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
