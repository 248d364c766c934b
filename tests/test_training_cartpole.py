"""End-to-end training smoke + learning test (SURVEY §4 layer 5)."""

import os

import numpy as np

from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config


def test_untrained_eval_is_honest(tmp_path):
    """Round-1 regression: eval used to keep accumulating rewards after an
    env terminated, so ANY policy scored the episode cap.  With the
    done-masked accumulator (reference ``trainer_base.py:794-846``) an
    untrained policy must score roughly the random-policy baseline."""
    from warpdrive_tpu.envs import register_all_envs
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    register_all_envs()
    cfg = load_run_config("single_cartpole")
    cfg["trainer"]["num_envs"] = 20
    cfg["trainer"]["train_batch_size"] = 2000
    cfg["trainer"]["num_episodes"] = 1000
    cfg["trainer"]["seed"] = 3
    cfg["env"]["episode_length"] = 200
    cfg["env"]["reset_pool_size"] = 0
    engine = EnvEngine(
        env_name="ClassicControlCartPoleEnv",
        env_config={"episode_length": 200, "reset_pool_size": 0, "seed": 4},
        num_envs=20,
    )
    trainer = TrainerA2C(
        env_wrapper=engine,
        config=cfg,
        verbose=False,
        results_dir=str(tmp_path / "results"),
    )
    rew_sum, step_sum = trainer.evaluate_episodes(use_argmax=True)
    mean_eval = float(rew_sum["shared"].sum(axis=1).mean())
    # untrained argmax CartPole falls over quickly; the broken round-1 eval
    # returned exactly the 200-step cap here
    assert mean_eval < 60, f"eval not honest: untrained policy got {mean_eval}"
    assert (step_sum["shared"] <= 200).all()


def test_cartpole_a2c_trains_and_learns(tmp_path):
    cfg = load_run_config("single_cartpole")
    cfg["trainer"]["num_envs"] = 20
    cfg["trainer"]["train_batch_size"] = 2000  # T = 100
    cfg["trainer"]["num_episodes"] = 1000  # 100 iterations
    cfg["trainer"]["seed"] = 11
    cfg["env"]["episode_length"] = 200
    cfg["env"]["reset_pool_size"] = 0
    cfg["env"]["seed"] = 5
    cfg["saving"]["metrics_log_freq"] = 50
    cfg["saving"]["model_params_save_freq"] = 10_000

    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )

    # metrics were appended to results.json
    results_file = tmp_path / "results" / "results.json"
    assert results_file.exists()
    lines = results_file.read_text().strip().splitlines()
    assert len(lines) >= 2

    # checkpoint exists and encodes the final timestep
    ckpts = [f for f in os.listdir(tmp_path / "results") if "state_dict" in f]
    assert any(str(trainer.current_timestep) in c for c in ckpts)

    # the policy learned something: honest done-masked argmax eval must
    # clearly beat the untrained baseline measured in
    # test_untrained_eval_is_honest below (<= ~30 steps)
    rew_sum, step_sum = trainer.evaluate_episodes(use_argmax=True)
    mean_eval = float(rew_sum["shared"].sum(axis=1).mean())
    assert mean_eval > 50, f"no learning signal: eval reward {mean_eval}"
    # step accounting is consistent with the reward sum on CartPole
    # (reward 1 per undone step)
    np.testing.assert_allclose(
        rew_sum["shared"].sum(axis=1), step_sum["shared"], atol=1e-5
    )

    # fetch_episode_states returns a truncated trajectory
    traj = trainer.fetch_episode_states(["state"], include_rewards_actions=True)
    assert traj["state"].ndim == 3 and traj["state"].shape[0] >= 2
    assert np.isfinite(traj["rewards"]).all()

    # ... and can record per-step action probabilities (reference
    # trainer_base.py:756-776)
    traj_p = trainer.fetch_episode_states(
        ["state"], include_rewards_actions=True, include_probabilities=True
    )
    probs = traj_p["probabilities"]["shared"][0]
    assert probs.shape[-1] == 2  # CartPole has 2 actions
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-4)


def test_profile_phases_breakdown(tmp_path):
    """profile_phases returns a real rollout/update split (round-1 gap: it
    promised rollout_ms/update_ms but returned only iteration_ms)."""
    cfg = load_run_config("single_cartpole")
    cfg["trainer"].update(
        {"num_envs": 10, "train_batch_size": 200, "num_episodes": 100,
         "seed": 2}
    )
    cfg["env"].update({"episode_length": 100, "reset_pool_size": 0})
    cfg["saving"]["metrics_log_freq"] = 100
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )
    prof = trainer.profile_phases(repeats=2)
    for key in ("iteration_ms", "rollout_ms", "update_ms", "steps_per_sec",
                "rollout_steps_per_sec"):
        assert key in prof and np.isfinite(prof[key]), prof
    assert prof["rollout_ms"] > 0
    # rollout is a strict subset of the iteration; the factor is generous
    # because CI machines measure a ~3 ms program under load
    assert prof["rollout_ms"] <= prof["iteration_ms"] * 2.5
    # the update phase is now timed DIRECTLY (an update-only program on a
    # materialized batch) — never the residual max(iter - rollout, 0),
    # which collapses to 0 whenever variance exceeds the update cost
    assert prof["update_ms_direct"] is True
    assert prof["update_ms"] > 0
    # the residual estimate is still reported for reference
    assert prof["update_ms_residual"] >= 0
    # ... and it feeds the logged perf stats
    stats = trainer.perf_stats.get_perf_stats()
    assert "Rollout time per iter (ms)" in stats


def test_use_evaluator_logs_test_metrics(tmp_path):
    """trainer.evaluator=True must add argmax test-time metrics at each log
    (reference trainer_a2c.py:326-339)."""
    import json

    cfg = load_run_config("single_cartpole")
    cfg["trainer"].update(
        {"num_envs": 10, "train_batch_size": 500, "num_episodes": 200,
         "seed": 4, "evaluator": True}
    )
    cfg["env"].update({"episode_length": 100, "reset_pool_size": 0})
    cfg["saving"]["metrics_log_freq"] = 2
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "results")
    )
    lines = (tmp_path / "results" / "results.json").read_text().splitlines()
    metrics = json.loads(lines[-1])["metrics"]["shared"]
    assert "Mean episodic reward (test)" in metrics
    assert "Mean episodic steps (test)" in metrics
    assert 0 < metrics["Mean episodic steps (test)"] <= 100


def test_remat_update_is_numerically_exact(tmp_path):
    """policy.remat=True recomputes update activations (jax.checkpoint)
    instead of storing the (T, E, N, hidden) batch — it must not change
    the training trajectory at all (checkpointing is exact)."""
    import jax
    import jax.numpy as jnp

    params = {}
    for remat in (False, True):
        cfg = load_run_config("single_cartpole")
        cfg["trainer"].update(
            {"num_envs": 10, "train_batch_size": 500, "num_episodes": 100,
             "seed": 9}
        )
        cfg["env"].update({"episode_length": 100, "reset_pool_size": 0,
                           "seed": 6})
        cfg["policy"]["shared"]["remat"] = remat
        cfg["saving"]["metrics_log_freq"] = 10_000
        cfg["saving"]["model_params_save_freq"] = 10_000
        trainer = setup_trainer_and_train(
            cfg, verbose=False,
            results_dir=str(tmp_path / f"results_{remat}"),
        )
        params[remat] = jax.device_get(trainer._current_params("shared"))

    flat_a = jax.tree_util.tree_leaves(params[False])
    flat_b = jax.tree_util.tree_leaves(params[True])
    assert len(flat_a) == len(flat_b)
    # exact up to float32 reduction-order rounding: the checkpointed
    # recompute may compile an equivalent-but-reordered reduction for the
    # flattened-batch matmul (observed: a single 1-ulp bias difference
    # after 20 iterations); any algorithmic difference would diverge by
    # orders of magnitude more over a full training run
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_fast_program_matches_full(tmp_path):
    """The metrics-free hot iteration program (run off log points) must
    produce the same training trajectory as the full-metrics program:
    identical grads, only the metric outputs dropped.  log_freq=1 forces
    the full program every iteration; log_freq=10_000 runs the hot program
    on all but the final iteration."""
    import jax

    params = {}
    for log_freq in (1, 10_000):
        cfg = load_run_config("single_cartpole")
        cfg["trainer"].update(
            {"num_envs": 10, "train_batch_size": 500, "num_episodes": 100,
             "seed": 9}
        )
        cfg["env"].update({"episode_length": 100, "reset_pool_size": 0,
                           "seed": 6})
        cfg["saving"]["metrics_log_freq"] = log_freq
        cfg["saving"]["model_params_save_freq"] = 10_000
        trainer = setup_trainer_and_train(
            cfg, verbose=False,
            results_dir=str(tmp_path / f"results_{log_freq}"),
        )
        params[log_freq] = jax.device_get(trainer._current_params("shared"))

    flat_a = jax.tree_util.tree_leaves(params[1])
    flat_b = jax.tree_util.tree_leaves(params[10_000])
    assert len(flat_a) == len(flat_b)
    # tolerance: float32 reduction-order rounding only (see the remat test)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )
