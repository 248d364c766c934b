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
