"""
Training CLI.

Parity with reference
``warp_drive/training/scripts/example_training_script_{pycuda,numba}.py``:

    python -m warpdrive_tpu.training.scripts.train -e single_cartpole
    python -m warpdrive_tpu.training.scripts.train -e tag_continuous -n 8 -a

``-e`` names a run config under ``training/run_configs``; ``-n`` sets the
device-mesh size (replacing one-process-per-GPU + DDP, reference
``distributed_trainer_pycuda.py:13-47``); ``-a`` runs the vertical auto-scaler
first (reference ``vertical_scaler.py:102-185``).
"""

from __future__ import annotations

import argparse
import logging

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.utils.config import load_run_config
from warpdrive_tpu.utils.env_registrar import env_registrar

# run-config name -> (registered env name, policy-map builder, trainer kind)
_ENV_SETUPS = {
    "single_cartpole": ("ClassicControlCartPoleEnv", "single", "a2c"),
    "single_mountain_car": ("ClassicControlMountainCarEnv", "single", "a2c"),
    "single_acrobot": ("ClassicControlAcrobotEnv", "single", "a2c"),
    "single_pendulum": ("ClassicControlPendulumEnv", "single", "ddpg"),
    "single_continuous_mountain_car": (
        "ClassicControlContinuousMountainCarEnv",
        "single",
        "ddpg",
    ),
    "tag_gridworld": ("TagGridWorld", "shared", "a2c"),
    "tag_gridworld_with_reset_pool": ("TagGridWorldWithResetPool", "shared", "a2c"),
    "tag_continuous": ("TagContinuous", "tag_continuous", "a2c"),
    # separate per-policy placeholders (heterogeneous obs/action spaces)
    "asymmetric_pursuit": ("AsymmetricPursuit", "separate", "a2c"),
}


def build_policy_map(kind: str, env) -> dict:
    if kind in ("single", "shared"):
        return {"shared": list(range(env.num_agents))}
    if kind == "tag_continuous":
        # two policies keyed on agent type (reference example script)
        taggers = [i for i in range(env.num_agents) if env.agent_type[i] == 1]
        runners = [i for i in range(env.num_agents) if env.agent_type[i] == 0]
        return {"tagger": taggers, "runner": runners}
    if kind == "separate":
        return env.policy_map()
    raise NotImplementedError(kind)


def setup_trainer(
    run_config: dict,
    env_setup: tuple = None,
    num_devices: int = 1,
    results_dir: str = None,
    verbose: bool = True,
):
    """Build engine + trainer from a merged run config (no training)."""
    register_all_envs()
    name = run_config.get("name")
    if env_setup is None:
        env_setup = _ENV_SETUPS[name]
    env_name, policy_kind, trainer_kind = env_setup

    env_cls = env_registrar.get(env_name, backend="tpu")
    env = env_cls(**run_config.get("env", {}))
    policy_map = build_policy_map(policy_kind, env)
    separate = policy_kind == "separate"
    engine = EnvEngine(
        env_obj=env,
        num_envs=run_config["trainer"]["num_envs"],
        seed=int(run_config["trainer"].get("seed", 0)),
        policy_tag_to_agent_id_map=policy_map if separate else None,
        create_separate_placeholders_for_each_policy=separate,
    )

    if trainer_kind == "a2c":
        from warpdrive_tpu.training.trainer_a2c import TrainerA2C as Trainer
    elif trainer_kind == "ddpg":
        from warpdrive_tpu.training.trainer_ddpg import TrainerDDPG as Trainer
    else:
        raise NotImplementedError(trainer_kind)

    if num_devices > 1:
        from warpdrive_tpu.parallel.mesh import apply_env_sharding

        engine = apply_env_sharding(engine, num_devices=num_devices)

    trainer = Trainer(
        env_wrapper=engine,
        config=run_config,
        policy_tag_to_agent_id_map=policy_map,
        create_separate_placeholders_for_each_policy=separate,
        num_devices=num_devices,
        results_dir=results_dir,
        verbose=verbose,
    )
    return trainer


def setup_trainer_and_train(
    run_config: dict,
    env_setup: tuple = None,
    num_devices: int = 1,
    results_dir: str = None,
    verbose: bool = True,
):
    """Build engine + trainer from a merged run config and run training."""
    trainer = setup_trainer(
        run_config,
        env_setup=env_setup,
        num_devices=num_devices,
        results_dir=results_dir,
        verbose=verbose,
    )
    trainer.train()
    return trainer


def main():
    import os

    parser = argparse.ArgumentParser(description="warpdrive-tpu training")
    parser.add_argument("-e", "--env", required=True, help="run config name")
    parser.add_argument(
        "-n", "--num_devices", type=int, default=1, help="TPU chips in the mesh"
    )
    parser.add_argument(
        "-a", "--auto_scale", action="store_true",
        help="binary-search num_envs / batch size before training",
    )
    parser.add_argument("--num_episodes", type=int, default=None)
    parser.add_argument("--num_envs", type=int, default=None)
    parser.add_argument("--results_dir", type=str, default=None)
    # multi-host bring-up (replaces the reference's one-process-per-GPU
    # launcher, ``distributed_trainer_pycuda.py:13-47``): launch ONE copy of
    # this script per host with the same --coordinator and its own
    # --process_id; the mesh then spans every host's devices and training
    # runs as a single SPMD program (checkpoints/metrics written by the
    # lead process only).  Env-var equivalents: WDT_COORDINATOR,
    # WDT_NUM_PROCESSES, WDT_PROCESS_ID.
    parser.add_argument(
        "--coordinator", type=str,
        default=os.environ.get("WDT_COORDINATOR"),
        help="host:port of process 0 (enables jax.distributed)",
    )
    parser.add_argument(
        "--num_processes", type=int,
        default=int(os.environ.get("WDT_NUM_PROCESSES", "0")) or None,
    )
    parser.add_argument(
        "--process_id", type=int,
        default=(int(os.environ["WDT_PROCESS_ID"])
                 if "WDT_PROCESS_ID" in os.environ else None),
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    if args.coordinator:
        from warpdrive_tpu.parallel.mesh import initialize_multihost

        initialize_multihost(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        import jax

        if args.num_devices <= 1:
            # default the mesh to the WHOLE multi-process slice
            args.num_devices = jax.device_count()
    run_config = load_run_config(args.env)
    if args.num_episodes is not None:
        run_config["trainer"]["num_episodes"] = args.num_episodes
    if args.num_envs is not None:
        run_config["trainer"]["num_envs"] = args.num_envs

    if args.auto_scale:
        from warpdrive_tpu.tools.autoscaler import perform_auto_vertical_scaling

        run_config = perform_auto_vertical_scaling(run_config, _ENV_SETUPS[args.env])

    setup_trainer_and_train(
        run_config, num_devices=args.num_devices, results_dir=args.results_dir
    )


if __name__ == "__main__":
    main()
