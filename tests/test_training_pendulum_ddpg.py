"""DDPG end-to-end training on Pendulum (SURVEY §4 layer 5; reference
``tests/wd_training`` + ``run_configs/single_pendulum.yaml``)."""

import os

import numpy as np

from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config


def _small_pendulum_cfg():
    cfg = load_run_config("single_pendulum")
    cfg["trainer"]["num_envs"] = 20
    cfg["trainer"]["train_batch_size"] = 1000  # T = 50
    cfg["trainer"]["num_episodes"] = 1000  # 20 iterations at ep_len=100
    cfg["trainer"]["n_step"] = 5
    cfg["trainer"]["seed"] = 7
    cfg["env"]["episode_length"] = 100
    cfg["env"]["reset_pool_size"] = 50
    cfg["env"]["seed"] = 3
    cfg["saving"]["metrics_log_freq"] = 5
    cfg["saving"]["model_params_save_freq"] = 10_000
    return cfg


def test_pendulum_ddpg_trains(tmp_path):
    cfg = _small_pendulum_cfg()
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )

    # metrics were appended to results.json and are finite
    results_file = tmp_path / "results" / "results.json"
    assert results_file.exists()
    lines = results_file.read_text().strip().splitlines()
    assert len(lines) >= 2
    import json

    last = json.loads(lines[-1])
    metrics = last["metrics"]["shared"]
    for key in ("Actor loss", "Critic loss", "Mean episodic reward"):
        assert np.isfinite(metrics[key]), f"{key} is not finite: {metrics[key]}"

    # the replay window filled and updates began after the first iteration
    assert metrics["Buffer full"] == 1.0
    assert int(np.asarray(trainer._carry["filled"])) == trainer.buffer_capacity

    # actor + critic checkpoints exist with the final timestep in the name
    ckpts = os.listdir(tmp_path / "results")
    t = trainer.current_timestep
    assert f"shared_actor_{t}.state_dict" in ckpts
    assert f"shared_critic_{t}.state_dict" in ckpts

    # deterministic (no-noise) evaluation runs and returns finite rewards
    rew_sum, step_sum = trainer.evaluate_episodes()
    assert np.isfinite(rew_sum["shared"]).all()
    assert (step_sum["shared"] > 0).all()

    # episode-state fetching works for the off-policy trainer too
    traj = trainer.fetch_episode_states(["state"], include_rewards_actions=True)
    assert traj["state"].shape[0] >= 2
    assert np.isfinite(traj["rewards"]).all()

    # params actually moved (buffer gating did not zero every update):
    # actor and target start equal; with tau < 1 the online net runs ahead
    import jax

    leaves_online = jax.tree_util.tree_leaves(trainer._carry["actor"]["shared"])
    leaves_target = jax.tree_util.tree_leaves(
        trainer._carry["target_actor"]["shared"]
    )
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_online, leaves_target)
    )
    assert moved, "actor params never updated"


def test_pendulum_ddpg_checkpoint_roundtrip(tmp_path):
    cfg = _small_pendulum_cfg()
    cfg["trainer"]["num_episodes"] = 200  # 4 iterations
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )
    t = trainer.current_timestep
    paths = {
        "shared": {
            "actor": str(tmp_path / "results" / f"shared_actor_{t}.state_dict"),
            "critic": str(tmp_path / "results" / f"shared_critic_{t}.state_dict"),
        }
    }
    # build a fresh trainer and restore
    cfg2 = _small_pendulum_cfg()
    cfg2["trainer"]["num_episodes"] = 200
    from warpdrive_tpu.envs import register_all_envs
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.training.trainer_ddpg import TrainerDDPG
    from warpdrive_tpu.utils.env_registrar import env_registrar

    register_all_envs()
    env_cls = env_registrar.get("ClassicControlPendulumEnv", backend="tpu")
    env = env_cls(**cfg2["env"])
    engine = EnvEngine(env_obj=env, num_envs=cfg2["trainer"]["num_envs"], seed=1)
    fresh = TrainerDDPG(
        env_wrapper=engine,
        config=cfg2,
        results_dir=str(tmp_path / "fresh"),
        verbose=False,
    )
    fresh.load_model_checkpoint(paths)
    assert fresh.current_timestep == t
    import jax

    for net in ("actor", "critic"):
        for a, b in zip(
            jax.tree_util.tree_leaves(fresh.params[net]["shared"]),
            jax.tree_util.tree_leaves(trainer._current_params("shared")[net]),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_ddpg_remat_update_is_numerically_exact(tmp_path):
    """policy.remat=True (jax.checkpoint around actor/critic applies in the
    replay update) must not change the training trajectory at all."""
    import jax

    params = {}
    for remat in (False, True):
        cfg = _small_pendulum_cfg()
        cfg["trainer"]["num_episodes"] = 200  # 4 iterations
        cfg["policy"]["shared"]["remat"] = remat
        cfg["saving"]["metrics_log_freq"] = 10_000
        trainer = setup_trainer_and_train(
            cfg, verbose=False,
            results_dir=str(tmp_path / f"results_{remat}"),
        )
        params[remat] = jax.device_get(
            {net: trainer._carry[net]["shared"]
             for net in ("actor", "critic")}
        )

    flat_a = jax.tree_util.tree_leaves(params[False])
    flat_b = jax.tree_util.tree_leaves(params[True])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        # exact up to float32 reduction-order rounding: the checkpointed
        # recompute may compile an equivalent-but-reordered reduction for
        # the flattened-batch matmul (same rationale as the A2C remat test)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_ddpg_fast_program_matches_full(tmp_path):
    """The metrics-free hot DDPG iteration (plain grads, no metric
    outputs) must produce the same training trajectory as the
    full-metrics program (see the A2C twin test for the mechanism)."""
    import jax

    params = {}
    for log_freq in (1, 10_000):
        cfg = _small_pendulum_cfg()
        cfg["trainer"]["num_episodes"] = 200  # 4 iterations
        cfg["saving"]["metrics_log_freq"] = log_freq
        trainer = setup_trainer_and_train(
            cfg, verbose=False,
            results_dir=str(tmp_path / f"results_{log_freq}"),
        )
        params[log_freq] = jax.device_get(
            {net: trainer._carry[net]["shared"]
             for net in ("actor", "critic")}
        )

    flat_a = jax.tree_util.tree_leaves(params[1])
    flat_b = jax.tree_util.tree_leaves(params[10_000])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_ddpg_midrun_partial_reload(tmp_path):
    """A mid-run reload of ONE net of ONE policy must not touch the other
    carry entries (they alias buffers donated to the jitted program —
    wholesale rebuild used to reinsert deleted arrays and crash)."""
    import jax

    cfg = _small_pendulum_cfg()
    cfg["trainer"]["num_episodes"] = 200  # 4 iterations
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )
    t = trainer.current_timestep
    actor_path = str(tmp_path / "results" / f"shared_actor_{t}.state_dict")
    # partial reload: actor only
    trainer.load_model_checkpoint({"shared": {"actor": actor_path}})
    # training continues without 'Array has been deleted'
    import jax.numpy as jnp

    trainer._carry, _ = trainer._iteration_fn(
        trainer._carry, jnp.asarray(float(t), jnp.float32)
    )


def test_ddpg_load_rejects_string_paths(tmp_path):
    import pytest

    cfg = _small_pendulum_cfg()
    cfg["trainer"]["num_episodes"] = 200
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )
    with pytest.raises(TypeError):
        trainer.load_model_checkpoint({"shared": "/tmp/nope.state_dict"})


def test_ddpg_eager_backend_honors_checkpoint(tmp_path):
    """Round-2 regression: on the eager CPU backend a configured
    checkpoint used to be silently discarded (the eager nets were built
    before the load and never refreshed)."""
    import jax
    import numpy as np

    cfg = _small_pendulum_cfg()
    cfg["trainer"]["num_episodes"] = 200
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )
    t = trainer.current_timestep
    paths = {
        "shared": {
            "actor": str(tmp_path / "results" / f"shared_actor_{t}.state_dict"),
            "critic": str(
                tmp_path / "results" / f"shared_critic_{t}.state_dict"
            ),
        }
    }

    cfg2 = _small_pendulum_cfg()
    cfg2["trainer"]["env_backend"] = "cpu"
    from warpdrive_tpu.envs import register_all_envs
    from warpdrive_tpu.envs.cpu_engine import CpuEnvEngine
    from warpdrive_tpu.training.trainer_ddpg import TrainerDDPG
    from warpdrive_tpu.utils.env_registrar import env_registrar

    register_all_envs()
    env_cls = env_registrar.get("ClassicControlPendulumEnv", backend="cpu")
    engine = CpuEnvEngine(
        env_obj=env_cls(**cfg2["env"]),
        num_envs=cfg2["trainer"]["num_envs"], seed=1,
    )
    eager = TrainerDDPG(
        env_wrapper=engine, config=cfg2,
        results_dir=str(tmp_path / "eager"), verbose=False,
    )
    eager.load_model_checkpoint(paths)
    for net in ("actor", "critic"):
        for a, b in zip(
            jax.tree_util.tree_leaves(eager._eager_nets[net]["shared"]),
            jax.tree_util.tree_leaves(trainer._current_params("shared")[net]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6
            )


def test_ddpg_batch_dtype_halves_replay_obs(tmp_path):
    import jax.numpy as jnp

    cfg = _small_pendulum_cfg()
    cfg["trainer"]["num_episodes"] = 200
    cfg["trainer"]["batch_dtype"] = "bfloat16"
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )
    assert trainer._carry["buf"]["shared"]["obs"].dtype == jnp.bfloat16


def test_ddpg_profile_phases_direct_update(tmp_path):
    """profile_phases times the DDPG replay-append+update program DIRECTLY
    (VERDICT r3 weak #3: the residual max(iter - rollout, 0) estimate
    published update_ms=0.0 whenever variance exceeded the update cost)."""
    cfg = _small_pendulum_cfg()
    cfg["trainer"]["num_episodes"] = 100  # 2 iterations
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )
    prof = trainer.profile_phases(repeats=2)
    assert prof["update_ms_direct"] is True
    assert prof["update_ms"] > 0
    assert np.isfinite(prof["rollout_ms"]) and prof["rollout_ms"] > 0
