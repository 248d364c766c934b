"""Full train-state checkpoint/resume (beyond reference parity: the
reference saves model params only and cannot resume optimizer/env state)."""

import numpy as np

import jax
import jax.numpy as jnp

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.training.trainer_a2c import TrainerA2C

register_all_envs()


def _trainer(tmp_path, tag):
    engine = EnvEngine(
        env_name="ClassicControlCartPoleEnv",
        env_config={"episode_length": 50, "reset_pool_size": 0, "seed": 4},
        num_envs=8,
    )
    cfg = {
        "name": "cp", "env": {},
        "trainer": {"num_envs": 8, "num_episodes": 160,
                    "train_batch_size": 160, "seed": 13},
        "policy": {"shared": {"to_train": True, "gamma": 0.98, "lr": 0.003,
                              "model": {"type": "fully_connected",
                                        "fc_dims": [16, 16]}}},
        "saving": {"metrics_log_freq": 100, "model_params_save_freq": 10_000},
    }
    return TrainerA2C(env_wrapper=engine, config=cfg, verbose=False,
                      results_dir=str(tmp_path / tag))


def test_resume_is_bit_exact(tmp_path):
    # run A for 6 iterations straight
    t_a = _trainer(tmp_path, "a")
    for i in range(6):
        t_a._carry, _ = t_a._iteration_fn(
            t_a._carry, jnp.asarray(t_a.current_timestep, jnp.float32)
        )
        t_a.current_timestep += t_a.train_batch_size

    # run B for 3, checkpoint, rebuild fresh, restore, run 3 more
    t_b = _trainer(tmp_path, "b")
    for i in range(3):
        t_b._carry, _ = t_b._iteration_fn(
            t_b._carry, jnp.asarray(t_b.current_timestep, jnp.float32)
        )
        t_b.current_timestep += t_b.train_batch_size
    path = t_b.save_full_state()

    t_c = _trainer(tmp_path, "c")  # fresh trainer, different init
    t_c.load_full_state(path)
    assert t_c.current_timestep == t_b.current_timestep
    for i in range(3):
        t_c._carry, _ = t_c._iteration_fn(
            t_c._carry, jnp.asarray(t_c.current_timestep, jnp.float32)
        )
        t_c.current_timestep += t_c.train_batch_size

    la = jax.tree_util.tree_leaves(t_a._carry["params"])
    lc = jax.tree_util.tree_leaves(t_c._carry["params"])
    for a, c in zip(la, lc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # optimizer state resumed too
    oa = jax.tree_util.tree_leaves(t_a._carry["opt"])
    oc = jax.tree_util.tree_leaves(t_c._carry["opt"])
    for a, c in zip(oa, oc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
