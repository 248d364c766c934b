"""
Scaling-efficiency rehearsal (VERDICT r3 missing #3).

Real multi-chip hardware is unavailable in this environment, so the
*measurable* proxy for the reference's "almost linear" multi-GPU scaling
claim (``tutorials/tutorial-6:27``) is process/coordination overhead at
constant device count: the SAME training program, the SAME 8 XLA devices,
run as

* 1 process x 8 virtual CPU devices (the in-process SPMD baseline), and
* 2 processes x 4 virtual CPU devices each (``jax.distributed`` rendezvous,
  a process-spanning mesh, cross-process gradient psums)

and the efficiency ratio ``steps_per_sec(2proc) / steps_per_sec(1proc)``.
Everything the multi-process path adds — rendezvous, cross-host collective
scheduling, per-process dispatch — shows up as ratio < 1.  On real
multi-host TPU the same program rides ICI instead of the gloo-style CPU
transport, so this is a *pessimistic* rehearsal of the coordination cost.

Run: ``python -m warpdrive_tpu.tools.scaling_rehearsal <outdir>``
(CPU-only; spawns its own subprocesses with scrubbed TPU hooks).
Writes ``<outdir>/scaling_rehearsal.json``.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

# two scales: a tiny iteration (coordination-latency-bound — the floor)
# and a bigger one (compute amortizes the cross-process overhead — the
# regime the reference's linear-scaling claim lives in).  Round 5
# (VERDICT r4 next #5): three PROGRAM SHAPES, not just the lightest one —
# gridworld A2C (cheap obs), flagship kNN-observe (ladder) A2C (the
# heavy per-step-obs case where per-step collectives would actually
# hurt), and on-device-replay DDPG.
SCALES = {"small": 32, "large": 512, "xlarge": 2048, "xxlarge": 8192}
SHAPES = ("gridworld", "flagship_knn", "ddpg")
T_STEPS = 20
TIMED_ITERS = 8
NUM_ENVS = 32  # overridden per run via WD_REHEARSAL_ENVS


def _num_envs() -> int:
    return int(os.environ.get("WD_REHEARSAL_ENVS", NUM_ENVS))


def _shape() -> str:
    return os.environ.get("WD_REHEARSAL_SHAPE", "gridworld")


def _build_trainer(outdir: str):
    shape = _shape()
    if shape == "flagship_knn":
        return _build_trainer_flagship_knn(outdir)
    if shape == "ddpg":
        return _build_trainer_ddpg(outdir)
    return _build_trainer_gridworld(outdir)


def _saving(outdir: str) -> dict:
    return {
        "metrics_log_freq": 10**9,
        "model_params_save_freq": 10**9,
        "basedir": outdir,
        "name": "sr",
        "tag": "t",
    }


def _build_trainer_gridworld(outdir: str):
    from warpdrive_tpu.envs import register_all_envs
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_gridworld import TpuTagGridWorld
    from warpdrive_tpu.parallel.mesh import apply_env_sharding
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    register_all_envs()
    n_envs = _num_envs()
    env = TpuTagGridWorld(
        num_taggers=4, grid_length=10, episode_length=T_STEPS, seed=7,
        use_full_observation=False,
    )
    engine = EnvEngine(env_obj=env, num_envs=n_envs, seed=7)
    engine = apply_env_sharding(engine)  # spans all global devices
    cfg = {
        "name": "scaling_rehearsal",
        "env": {},
        "trainer": {
            "num_envs": n_envs,
            "num_episodes": 4 * n_envs,
            "train_batch_size": n_envs * T_STEPS,
            "seed": 1,
        },
        "policy": {
            "shared": {
                "to_train": True,
                "algorithm": "A2C",
                "gamma": 0.98,
                "lr": 1e-3,
                "model": {"type": "fully_connected", "fc_dims": [32, 32]},
            }
        },
        "saving": _saving(outdir),
    }
    return TrainerA2C(env_wrapper=engine, config=cfg, verbose=False)


def _build_trainer_flagship_knn(outdir: str):
    """Two-policy TagContinuous with per-step kNN observations on the
    CPU-runnable exact `ladder` algorithm — the flagship program shape
    (heavy in-scan observe; the Mosaic kernels are TPU-only, ladder has
    the same selection semantics in plain XLA)."""
    import numpy as np

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
    from warpdrive_tpu.parallel.mesh import apply_env_sharding
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    n_envs = _num_envs()
    env = TpuTagContinuous(
        num_taggers=3, num_runners=12, grid_length=10.0,
        episode_length=T_STEPS, seed=7, use_full_observation=False,
        num_other_agents_observed=4, knn_algorithm="ladder",
        knn_select="bf16pair",
    )
    engine = EnvEngine(env_obj=env, num_envs=n_envs, seed=7)
    engine = apply_env_sharding(engine)
    pol = {
        "to_train": True, "algorithm": "A2C", "gamma": 0.98, "lr": 1e-3,
        "model": {"type": "fully_connected", "fc_dims": [32, 32]},
    }
    cfg = {
        "name": "scaling_rehearsal_knn",
        "env": {},
        "trainer": {
            "num_envs": n_envs,
            "num_episodes": 4 * n_envs,
            "train_batch_size": n_envs * T_STEPS,
            "seed": 1,
        },
        "policy": {"tagger": dict(pol), "runner": dict(pol)},
        "saving": _saving(outdir),
    }
    pmap = {
        "runner": np.where(env.agent_types == 0)[0].tolist(),
        "tagger": np.where(env.agent_types == 1)[0].tolist(),
    }
    return TrainerA2C(env_wrapper=engine, config=cfg,
                      policy_tag_to_agent_id_map=pmap, verbose=False)


def _build_trainer_ddpg(outdir: str):
    """Pendulum DDPG: presampled OU noise, on-device replay ring,
    actor+critic+target soft updates — the off-policy program shape."""
    from warpdrive_tpu.envs import register_all_envs
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.parallel.mesh import apply_env_sharding
    from warpdrive_tpu.training.trainer_ddpg import TrainerDDPG
    from warpdrive_tpu.utils.env_registrar import env_registrar

    register_all_envs()
    n_envs = _num_envs()
    pend_cls = env_registrar.get("ClassicControlPendulumEnv", backend="tpu")
    engine = apply_env_sharding(
        EnvEngine(env_obj=pend_cls(episode_length=T_STEPS, seed=3),
                  num_envs=n_envs, seed=0)
    )
    cfg = {
        "name": "scaling_rehearsal_ddpg",
        "env": {},
        "trainer": {
            "num_envs": n_envs,
            "num_episodes": 2 * n_envs,
            "train_batch_size": n_envs * T_STEPS,
            "seed": 2,
        },
        "policy": {
            "shared": {
                "to_train": True,
                "algorithm": "DDPG",
                "gamma": 0.99,
                "tau": 0.05,
                "lr": {"actor": 1e-3, "critic": 1e-4},
                "model": {
                    "actor": {
                        "type": "fully_connected_actor",
                        "fc_dims": [16, 16],
                        "output_w": 2.0,
                    },
                    "critic": {
                        "type": "fully_connected_action_value_critic",
                        "fc_dims": [16, 16],
                    },
                },
            }
        },
        "sampler": {"params": {"damping": 0.15, "stddev": 0.2,
                               "scale": 1.0}},
        "saving": _saving(outdir),
    }
    return TrainerDDPG(env_wrapper=engine, config=cfg, verbose=False)


def _timed_steps_per_sec(trainer) -> float:
    """Post-compile wall time of TIMED_ITERS chained hot iterations.

    Chaining the carry keeps every execution's inputs unique (execution-
    memoization hazard, CLAUDE.md rule 5) and is exactly what train() does.
    """
    import jax
    import jax.numpy as jnp

    carry = trainer._carry
    carry, _ = trainer._iteration_fn_fast(
        carry, jnp.asarray(0.0, jnp.float32)
    )  # compile + warm
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    t0 = time.time()
    for i in range(TIMED_ITERS):
        carry, _ = trainer._iteration_fn_fast(
            carry, jnp.asarray(float(i + 1), jnp.float32)
        )
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    dt = time.time() - t0
    return TIMED_ITERS * _num_envs() * T_STEPS / dt


def _run_single(outdir: str) -> None:
    """1 process x 8 devices: executed in a subprocess (mode=single)."""
    trainer = _build_trainer(outdir)
    rate = _timed_steps_per_sec(trainer)
    with open(os.path.join(outdir, "single.json"), "w") as f:
        json.dump({"steps_per_sec": rate}, f)
    print(f"[single] {rate:,.0f} steps/s", flush=True)


def _run_worker(coordinator: str, num_processes: int, process_id: int,
                outdir: str) -> None:
    """One of 2 distributed processes x 4 devices (mode=worker)."""
    import jax

    from warpdrive_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.device_count() == 4 * num_processes
    trainer = _build_trainer(outdir)
    rate = _timed_steps_per_sec(trainer)
    if jax.process_index() == 0:
        with open(os.path.join(outdir, "multi.json"), "w") as f:
            json.dump({"steps_per_sec": rate}, f)
    print(f"[worker {process_id}] {rate:,.0f} steps/s", flush=True)
    jax.distributed.shutdown()


def _cpu_env(n_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}"
    )
    # scrub the TPU-plugin sitecustomize: it blocks on the device claim at
    # interpreter start (docs/performance.md)
    # ... and make sure the subprocess can import warpdrive_tpu even when
    # the parent found it via cwd rather than PYTHONPATH (running a script
    # by path puts the SCRIPT's dir on sys.path, not the repo root)
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root]
        + [
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p and p != repo_root
        ]
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def _measure_scale(outdir: str, n_envs: int, timeout_s: int,
                   shape: str = "gridworld") -> dict:
    me = os.path.abspath(__file__)

    def env_for(n_devices):
        env = _cpu_env(n_devices)
        env["WD_REHEARSAL_ENVS"] = str(n_envs)
        env["WD_REHEARSAL_SHAPE"] = shape
        return env

    single = subprocess.run(
        [sys.executable, me, "single", outdir],
        env=env_for(8), timeout=timeout_s, capture_output=True, text=True,
    )
    assert single.returncode == 0, (
        f"single-process run failed:\n{single.stdout}\n{single.stderr}"
    )

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coordinator = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, me, "worker", coordinator, "2", str(pid), outdir],
            env=env_for(4), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=timeout_s)
        assert p.returncode == 0, f"worker failed:\n{out}"

    with open(os.path.join(outdir, "single.json")) as f:
        single_rate = json.load(f)["steps_per_sec"]
    with open(os.path.join(outdir, "multi.json")) as f:
        multi_rate = json.load(f)["steps_per_sec"]
    return {
        "num_envs": n_envs,
        "shape": shape,
        "steps_per_iter": n_envs * T_STEPS,
        "single_process_8dev_steps_per_sec": round(single_rate),
        "two_process_4dev_steps_per_sec": round(multi_rate),
        "process_scaling_efficiency": round(multi_rate / single_rate, 4),
    }


def orchestrate(outdir: str, timeout_s: int = 900,
                shapes=SHAPES) -> dict:
    """Run both configurations at each scale for each program shape;
    write the ratios."""
    os.makedirs(outdir, exist_ok=True)
    result = {
        "config": {
            "shapes": {
                "gridworld": "TagGridWorld(4 taggers, 10x10) A2C",
                "flagship_knn": "TagContinuous(3+12, k=4, ladder kNN) "
                                "two-policy A2C",
                "ddpg": "Pendulum DDPG (OU noise, on-device replay)",
            },
            "timed_iters": TIMED_ITERS,
            "devices_total": 8,
        },
        "shapes": {
            shape: {
                "scales": {
                    label: _measure_scale(outdir, n_envs, timeout_s,
                                          shape=shape)
                    for label, n_envs in SCALES.items()
                }
            }
            for shape in shapes
        },
        "note": (
            "same SPMD program, same 8 XLA CPU devices; the ratio isolates "
            "jax.distributed process/coordination overhead (pessimistic "
            "proxy: real multi-host TPU collectives ride ICI, not the CPU "
            "transport). The small scale is the per-iteration coordination "
            "floor; the large scale is the batch-bound regime the "
            "reference's linear-scaling claim (tutorial-6 'almost linear', "
            "BASELINE >=80% at >=2 hosts) lives in."
        ),
    }
    with open(os.path.join(outdir, "scaling_rehearsal.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)
    return result


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "orchestrate"
    if mode == "single":
        _run_single(sys.argv[2])
    elif mode == "worker":
        _run_worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
                    sys.argv[5])
    else:
        orchestrate(sys.argv[1] if len(sys.argv) > 1 else
                    "artifacts/round4")


if __name__ == "__main__":
    main()
