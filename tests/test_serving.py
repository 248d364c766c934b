"""Standalone policy export/load: a trained policy serves without the
trainer or env stack and reproduces the trainer's argmax actions."""

import numpy as np

import jax
import jax.numpy as jnp

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.serving import export_policy, load_policy
from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
from warpdrive_tpu.utils.config import load_run_config

register_all_envs()


def test_export_load_roundtrip(tmp_path):
    cfg = load_run_config("single_cartpole")
    cfg["trainer"].update({"num_envs": 8, "train_batch_size": 160,
                           "num_episodes": 160, "seed": 3})
    cfg["env"].update({"episode_length": 50, "reset_pool_size": 0})
    trainer = setup_trainer_and_train(
        cfg, verbose=False, results_dir=str(tmp_path / "r")
    )
    bundle = export_policy(trainer, "shared", str(tmp_path / "bundle"))

    act, manifest = load_policy(bundle)
    assert manifest["obs_size"] == 4 and manifest["output_dims"] == [2]

    # identical argmax decisions vs the trainer's own act fn
    state = {k: jnp.asarray(v) for k, v in trainer.engine.state.items()}
    obs_p, _ = trainer._policy_obs_and_mask(state, None, "shared")
    served = act(np.asarray(obs_p))
    trainer_actions = np.asarray(
        trainer._act_fn(
            trainer._act_params(), state, jax.random.PRNGKey(0),
            use_argmax=True,
        )
    )
    np.testing.assert_array_equal(served, trainer_actions)

    # stochastic mode draws valid actions
    sampled = act(np.asarray(obs_p), key=jax.random.PRNGKey(1), argmax=False)
    assert sampled.shape == served.shape
    assert ((sampled >= 0) & (sampled < 2)).all()
