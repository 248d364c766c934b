"""Action-mask plumbing: envs exposing an ``action_mask`` state array get
masked policy logits everywhere (reference ``model_base.py:133-179,
203-213``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpdrive_tpu.envs.base import TpuEnvironmentContext
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.training.trainer_a2c import TrainerA2C
from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.data_feed import DataFeed
from warpdrive_tpu.utils.spaces import Box, Discrete


class MaskedBandit(TpuEnvironmentContext):
    """1-agent, 3-action bandit whose mask forbids action 0."""

    name = "MaskedBandit"

    def __init__(self, episode_length=4, **kwargs):
        self.num_agents = 1
        self.episode_length = episode_length
        self.action_space = {0: Discrete(3)}
        self.observation_space = {0: Box(-1.0, 1.0, shape=(2,))}

    def reset(self):
        return {0: np.zeros(2, np.float32)}

    def get_data_dictionary(self):
        feed = DataFeed()
        feed.add_data(
            Constants.ACTION_MASK,
            np.array([[0.0, 1.0, 1.0]], np.float32),  # (agents, n_actions)
            save_copy_and_apply_at_reset=True,
        )
        return feed

    def step_fn(self, state):
        t = state[Constants.TIMESTEP] + 1
        a = state[Constants.ACTIONS][0, 0]
        out = dict(state)
        out[Constants.OBSERVATIONS] = jnp.stack(
            [jnp.cos(a.astype(jnp.float32)), jnp.sin(t.astype(jnp.float32))]
        )[None, :]
        out[Constants.REWARDS] = jnp.where(a == 1, 1.0, 0.0)[None].astype(
            jnp.float32
        )
        out[Constants.TIMESTEP] = t
        out[Constants.DONE] = jnp.where(t >= self.episode_length, 1, 0).astype(
            jnp.int32
        )
        return out


def test_masked_actions_are_never_sampled():
    engine = EnvEngine(env_obj=MaskedBandit(), num_envs=8, seed=0)
    config = {
        "trainer": {
            "num_envs": 8,
            "num_episodes": 160,
            "train_batch_size": 64,  # T = 8
            "seed": 5,
        },
        "policy": {
            "shared": {
                "to_train": True,
                "algorithm": "A2C",
                "gamma": 0.9,
                "lr": 1e-3,
                "model": {"type": "fully_connected", "fc_dims": [8]},
            }
        },
        "saving": {"basedir": "/tmp/wdtpu_mask", "metrics_log_freq": 1},
    }
    trainer = TrainerA2C(env_wrapper=engine, config=config, verbose=False)

    # stochastic sampling through the act fn: forbidden action never drawn
    state = dict(engine.state)
    for i in range(20):
        actions = trainer._act_fn(
            trainer._carry["params"], state, jax.random.PRNGKey(i)
        )
        assert (np.asarray(actions) != 0).all(), "masked action was sampled"

    # one full training iteration with the mask in the loss forward
    carry, metrics = trainer._iteration_fn(
        trainer._carry, jnp.asarray(0.0, jnp.float32)
    )
    assert np.isfinite(float(metrics["shared"]["Total loss"]))
