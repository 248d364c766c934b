"""Multi-epoch PPO (beyond reference parity: fixed behavior-policy
log-probs + several optimizer epochs per rollout batch)."""

import numpy as np

import jax
import jax.numpy as jnp

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.training.trainer_a2c import TrainerA2C
from warpdrive_tpu.utils.env_registrar import env_registrar


def _trainer(num_epochs):
    register_all_envs()
    env_cls = env_registrar.get("ClassicControlCartPoleEnv", backend="tpu")
    engine = EnvEngine(
        env_obj=env_cls(episode_length=50, seed=3), num_envs=8, seed=0
    )
    config = {
        "trainer": {
            "num_envs": 8,
            "num_episodes": 100,
            "train_batch_size": 40,  # T = 5
            "seed": 13,
        },
        "policy": {
            "shared": {
                "to_train": True,
                "algorithm": "PPO",
                "clip_param": 0.2,
                "num_epochs": num_epochs,
                "gamma": 0.98,
                "lr": 1e-2,
                "model": {"type": "fully_connected", "fc_dims": [8]},
            }
        },
        "saving": {"basedir": "/tmp/wdtpu_ppo_epochs", "metrics_log_freq": 1},
    }
    return TrainerA2C(env_wrapper=engine, config=config, verbose=False)


def test_multi_epoch_ppo_takes_larger_steps():
    tr1 = _trainer(num_epochs=1)
    tr4 = _trainer(num_epochs=4)
    # snapshot inits before the (donating) iteration call
    p0 = [
        np.asarray(x)
        for x in jax.tree_util.tree_leaves(tr1.params["shared"])
    ]

    c1, m1 = tr1._iteration_fn(tr1._carry, jnp.asarray(0.0, jnp.float32))
    c4, m4 = tr4._iteration_fn(tr4._carry, jnp.asarray(0.0, jnp.float32))
    assert np.isfinite(float(m4["shared"]["Total loss"]))

    # identical seeds -> identical rollouts; 4 epochs must move the params
    # further from the (identical) starting point than 1 epoch
    def dist(carry):
        return sum(
            float(jnp.abs(jnp.asarray(a) - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(carry["params"]["shared"]), p0
            )
        )

    d1 = dist(c1)
    d4 = dist(c4)
    assert d4 > d1 * 1.5, (d1, d4)


def test_ppo_minibatches(tmp_path):
    """Env-axis PPO minibatching (beyond parity): trains with
    num_epochs=2 x num_minibatches=2 and produces finite metrics distinct
    from the single-batch run."""
    import json

    import numpy as np

    from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
    from warpdrive_tpu.utils.config import load_run_config

    def run(num_mb, tag):
        cfg = load_run_config("single_cartpole")
        cfg["trainer"].update({"num_envs": 8, "train_batch_size": 160,
                               "num_episodes": 160, "seed": 21})
        cfg["env"].update({"episode_length": 50, "reset_pool_size": 0})
        cfg["policy"]["shared"].update({"algorithm": "PPO", "num_epochs": 2,
                                        "num_minibatches": num_mb})
        cfg["saving"]["metrics_log_freq"] = 1
        t = setup_trainer_and_train(
            cfg, verbose=False, results_dir=str(tmp_path / tag)
        )
        lines = (tmp_path / tag / "results.json").read_text().splitlines()
        return t, json.loads(lines[-1])["metrics"]["shared"]

    t1, m1 = run(1, "mb1")
    t2, m2 = run(2, "mb2")
    assert np.isfinite(m2["Total loss"]) and np.isfinite(m2["Policy loss"])
    # different update trajectories -> different final params
    import jax

    l1 = jax.tree_util.tree_leaves(t1._carry["params"])
    l2 = jax.tree_util.tree_leaves(t2._carry["params"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(l1, l2)
    )


def test_minibatch_contiguous_slicing(tmp_path):
    """shuffle_minibatches=False (contiguous dynamic_slice env blocks, the
    TPU-fast path for single-epoch A2C) trains to finite metrics and moves
    the params; A2C defaults to it (num_epochs==1), PPO defaults to the
    shuffled gather."""
    import json

    import numpy as np

    from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
    from warpdrive_tpu.utils.config import load_run_config

    cfg = load_run_config("single_cartpole")
    cfg["trainer"].update({"num_envs": 8, "train_batch_size": 160,
                           "num_episodes": 160, "seed": 21})
    cfg["env"].update({"episode_length": 50, "reset_pool_size": 0})
    cfg["policy"]["shared"].update({"algorithm": "A2C",
                                    "num_minibatches": 4})
    cfg["saving"]["metrics_log_freq"] = 1
    t = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "contig")
    )
    assert t.mb_shuffle["shared"] is False  # A2C single-epoch default
    lines = (tmp_path / "contig" / "results.json").read_text().splitlines()
    m = json.loads(lines[-1])["metrics"]["shared"]
    assert np.isfinite(m["Total loss"]) and np.isfinite(m["Policy loss"])

    # PPO multi-epoch keeps the shuffle unless told otherwise
    cfg["policy"]["shared"].update({"algorithm": "PPO", "num_epochs": 2})
    t2 = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "ppo")
    )
    assert t2.mb_shuffle["shared"] is True
