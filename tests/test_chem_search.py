"""rlchemists one-atom chemistry-search env (community example parity)."""

import numpy as np

from warpdrive_tpu.envs.chem_search import (
    SingleAgentOneAtomChemSearch,
    TpuSingleAgentOneAtomChemSearch,
    make_synthetic_landscape,
)
from warpdrive_tpu.tools.consistency import EnvironmentCPUvsTPU


def _cfg(is_3d):
    nx, ny = 8, 8
    z_lo, z_hi = 2, 6
    en = make_synthetic_landscape(nx, ny, z_hi - z_lo, seed=4)
    return {
        "ienergy": 0.5,
        "max_denergy": 2.0,
        "nx": nx, "ny": ny, "nz": 8,
        "z_slab_lower": z_lo, "z_slab_upper": z_hi,
        "initial_state": [1, 1, 3],
        "final_state": [6, 6, 4 if is_3d else 3],
        "terminate_reward": 10.0,
        "min_reward": -1.0,
        "episode_length": 25,
        "en_array": en,
    }


def test_consistency_2d_and_3d():
    EnvironmentCPUvsTPU(
        cpu_env_class=SingleAgentOneAtomChemSearch,
        tpu_env_class=TpuSingleAgentOneAtomChemSearch,
        env_configs={"mode_2d": _cfg(False), "mode_3d": _cfg(True)},
        num_envs=3,
        num_episodes=2,
    ).test_env_reset_and_step(threshold_pct=0.1, seed=19)


def test_trains_a2c(tmp_path):
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    env = TpuSingleAgentOneAtomChemSearch(**_cfg(True))
    eng = EnvEngine(env_obj=env, num_envs=10, seed=2)
    cfg = {
        "name": "chem", "env": {},
        "trainer": {"num_envs": 10, "num_episodes": 160,
                    "train_batch_size": 500, "seed": 6},
        "policy": {"shared": {"to_train": True, "algorithm": "A2C",
                              "gamma": 0.97, "lr": 0.003,
                              "entropy_coeff": 0.03,
                              "model": {"type": "fully_connected",
                                        "fc_dims": [32, 32]}}},
        "saving": {"metrics_log_freq": 4, "model_params_save_freq": 1000},
    }
    tr = TrainerA2C(env_wrapper=eng, config=cfg, verbose=False,
                    results_dir=str(tmp_path / "r"))
    tr.train()
    rew, steps = tr.evaluate_episodes(use_argmax=True)
    assert np.isfinite(rew["shared"]).all()
    # dense logging works (position flagged)
    traj = tr.fetch_logged_episode()
    assert traj["position"].shape[1:] == (1, 3)


def _cfg_two_atom():
    nx, ny = 6, 6
    z_lo, z_hi = 1, 4
    eff = z_hi - z_lo
    rng = np.random.RandomState(8)
    en6 = rng.uniform(-1.0, 1.0, size=(nx, ny, eff, nx, ny, eff)).astype(
        np.float32
    )
    return {
        "ienergy": 0.2,
        "max_denergy": 2.0,
        "nx": nx, "ny": ny, "nz": 6,
        "z_slab_lower": z_lo, "z_slab_upper": z_hi,
        "initial_state": [1, 1, 2, 4, 4, 2],
        "final_state": [5, 5, 2, 0, 0, 2],
        "terminate_reward": 10.0,
        "min_reward": -1.0,
        "episode_length": 20,
        "en_array": en6,
    }


def test_two_atom_consistency():
    from warpdrive_tpu.envs.chem_search import (
        SingleAgentTwoAtomChemSearch,
        TpuSingleAgentTwoAtomChemSearch,
    )

    EnvironmentCPUvsTPU(
        cpu_env_class=SingleAgentTwoAtomChemSearch,
        tpu_env_class=TpuSingleAgentTwoAtomChemSearch,
        env_configs={"base": _cfg_two_atom()},
        num_envs=3,
        num_episodes=2,
    ).test_env_reset_and_step(threshold_pct=0.1, seed=23)


def test_two_atom_trains_a2c(tmp_path):
    from warpdrive_tpu.envs.chem_search import TpuSingleAgentTwoAtomChemSearch
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    env = TpuSingleAgentTwoAtomChemSearch(**_cfg_two_atom())
    eng = EnvEngine(env_obj=env, num_envs=8, seed=3)
    cfg = {
        "name": "chem2", "env": {},
        "trainer": {"num_envs": 8, "num_episodes": 60,
                    "train_batch_size": 240, "seed": 7},
        "policy": {"shared": {"to_train": True, "algorithm": "A2C",
                              "gamma": 0.97, "lr": 0.003,
                              "model": {"type": "fully_connected",
                                        "fc_dims": [32]}}},
        "saving": {"metrics_log_freq": 2, "model_params_save_freq": 1000},
    }
    tr = TrainerA2C(env_wrapper=eng, config=cfg, verbose=False,
                    results_dir=str(tmp_path / "r"))
    tr.train()
    rew, _ = tr.evaluate_episodes(use_argmax=True)
    assert np.isfinite(rew["shared"]).all()
