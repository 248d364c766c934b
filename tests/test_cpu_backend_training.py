"""Eager CPU backend (numpy reference envs) trains through TrainerA2C —
reference env_backend='cpu' training parity (round-1 gap: CpuEnvEngine was
a debugging facade only)."""

import numpy as np

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.envs.cpu_engine import CpuEnvEngine
from warpdrive_tpu.training.trainer_a2c import TrainerA2C

register_all_envs()


def _cfg(num_envs, T=20, iters=4):
    return {
        "name": "tg_cpu",
        "env": {},
        "trainer": {"num_envs": num_envs,
                    "num_episodes": (iters * T * num_envs) // 30,
                    "train_batch_size": T * num_envs, "seed": 3},
        "policy": {"shared": {"to_train": True, "algorithm": "A2C",
                              "gamma": 0.95, "lr": 0.005,
                              "model": {"type": "fully_connected",
                                        "fc_dims": [16, 16]}}},
        "saving": {"metrics_log_freq": 2, "model_params_save_freq": 1000},
    }


def test_cpu_backend_trains_tag_gridworld(tmp_path):
    eng = CpuEnvEngine(
        env_name="TagGridWorld",
        env_config={"num_taggers": 3, "grid_length": 6, "episode_length": 30,
                    "seed": 5},
        num_envs=4,
        seed=5,
    )
    assert eng.is_eager and eng.state["observations"].shape[0] == 4
    trainer = TrainerA2C(
        env_wrapper=eng, config=_cfg(4), verbose=False,
        results_dir=str(tmp_path / "r"),
    )
    trainer.train()
    assert trainer.iters_completed == trainer.num_iters
    # metrics were logged
    lines = (tmp_path / "r" / "results.json").read_text().splitlines()
    assert lines
    import json

    metrics = json.loads(lines[-1])["metrics"]["shared"]
    assert np.isfinite(metrics["Total loss"])
    assert np.isfinite(metrics["Mean episodic reward"])

    # done-masked eval works eagerly too
    rew, steps = trainer.evaluate_episodes(use_argmax=True)
    assert rew["shared"].shape == (4, 4)
    assert (steps["shared"] <= 30).all()
    # checkpoints saved from self.params (no carry in eager mode)
    import os

    assert any("state_dict" in f for f in os.listdir(tmp_path / "r"))


def test_cpu_backend_fetch_episode_states(tmp_path):
    eng = CpuEnvEngine(
        env_name="TagGridWorld",
        env_config={"num_taggers": 2, "grid_length": 5, "episode_length": 15,
                    "seed": 2},
        num_envs=3,
    )
    trainer = TrainerA2C(
        env_wrapper=eng, config=_cfg(3, T=10, iters=2), verbose=False,
        results_dir=str(tmp_path / "r"),
    )
    traj = trainer.fetch_episode_states(
        ["observations"], include_rewards_actions=True
    )
    assert traj["observations"].shape[0] >= 2
    assert traj["rewards"].shape[0] == traj["observations"].shape[0] - 1
    assert np.isfinite(traj["rewards"]).all()


def test_cpu_backend_trains_ddpg_pendulum(tmp_path):
    """DDPG on the eager CPU backend (numpy reference Pendulum)."""
    from warpdrive_tpu.training.trainer_ddpg import TrainerDDPG

    eng = CpuEnvEngine(
        env_name="ClassicControlPendulumEnv",
        env_config={"episode_length": 20, "reset_pool_size": 0, "seed": 3},
        num_envs=4,
    )
    cfg = {
        "name": "pend_cpu", "env": {},
        "trainer": {"num_envs": 4, "num_episodes": 24,
                    "train_batch_size": 40, "seed": 5, "n_step": 1},
        "policy": {"shared": {
            "to_train": True, "algorithm": "DDPG", "gamma": 0.98,
            "lr": {"actor": 0.001, "critic": 0.002}, "tau": 0.05,
            "model": {"type": "fully_connected_actor_critic",
                      "actor": {"type": "fully_connected_actor",
                                "fc_dims": [16], "output_w": 2.0},
                      "critic": {"type": "fully_connected_action_value_critic",
                                 "fc_dims": [16]}},
        }},
        "saving": {"metrics_log_freq": 2, "model_params_save_freq": 1000},
    }
    trainer = TrainerDDPG(
        env_wrapper=eng, config=cfg, verbose=False,
        results_dir=str(tmp_path / "r"),
    )
    trainer.train()
    assert trainer.iters_completed == trainer.num_iters
    import json

    lines = (tmp_path / "r" / "results.json").read_text().splitlines()
    metrics = json.loads(lines[-1])["metrics"]["shared"]
    assert np.isfinite(metrics["Total loss"])
    assert metrics["Buffer full"] == 1.0
    rew, steps = trainer.evaluate_episodes()
    assert np.isfinite(rew["shared"]).all()


def test_eager_mid_training_eval_does_not_corrupt_engine(tmp_path):
    """Mid-training evaluation on the eager backend must leave the live
    engine exactly as it found it (the fused path evaluates on a copy)."""
    eng = CpuEnvEngine(
        env_name="TagGridWorld",
        env_config={"num_taggers": 2, "grid_length": 5, "episode_length": 20,
                    "seed": 7},
        num_envs=3,
    )
    cfg = _cfg(3, T=10, iters=2)
    cfg["trainer"]["evaluator"] = True
    trainer = TrainerA2C(
        env_wrapper=eng, config=cfg, verbose=False,
        results_dir=str(tmp_path / "r"),
    )
    # advance training a bit so envs are mid-episode
    trainer._eager_iteration(0)
    before = {k: np.asarray(v).copy() for k, v in eng.state.items()}
    env_locs = [(e.loc_x.copy(), e.loc_y.copy(), e.timestep)
                for e in eng.envs]

    trainer.evaluate_episodes(use_argmax=True)
    trainer.fetch_episode_states(["observations"])

    after = eng.state
    for k in before:
        np.testing.assert_array_equal(before[k], np.asarray(after[k]), k)
    for (x0, y0, t0), e in zip(env_locs, eng.envs):
        np.testing.assert_array_equal(x0, e.loc_x)
        np.testing.assert_array_equal(y0, e.loc_y)
        assert t0 == e.timestep
