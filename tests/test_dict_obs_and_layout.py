"""Shared Dict observations and agent-dim-last obs layout
(reference ``model_base.py:105-179``, ``data_loader.py:681-690``)."""

import numpy as np

import jax.numpy as jnp

from warpdrive_tpu.envs.base import TpuEnvironmentContext
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.training.trainer_a2c import TrainerA2C
from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.data_feed import DataFeed
from warpdrive_tpu.utils.spaces import Discrete

_OBS = Constants.OBSERVATIONS
_ACTIONS = Constants.ACTIONS
_REWARDS = Constants.REWARDS


class MiniDictObsEnv(TpuEnvironmentContext):
    """3 agents on a line; every agent's obs is a Dict {pos(1), others(2)}."""

    num_agents = 3
    episode_length = 8
    name = "MiniDictObsEnv"

    def __init__(self):
        self.action_space = {a: Discrete(3) for a in range(self.num_agents)}
        self.observation_space = None  # inferred from the dict obs
        self.pos = None

    def _obs(self):
        out = {}
        for a in range(self.num_agents):
            others = np.delete(self.pos, a)
            out[a] = {
                "pos": np.array([self.pos[a]], dtype=np.float32),
                "others": others.astype(np.float32),
            }
        return out

    def reset(self):
        self.pos = np.array([-1.0, 0.0, 1.0], dtype=np.float32)
        return self._obs()

    def get_data_dictionary(self):
        feed = DataFeed()
        feed.add_data("pos", self.pos, save_copy_and_apply_at_reset=True)
        return feed

    def step_fn(self, state):
        t = state[Constants.TIMESTEP] + 1
        act = state[_ACTIONS][:, 0].astype(jnp.float32) - 1.0  # {-1,0,1}
        pos = state["pos"] + 0.1 * act
        # others: constant (N, N-1) index table -> one-hot contraction
        N = self.num_agents
        idx = jnp.arange(N - 1)[None, :] + (
            jnp.arange(N - 1)[None, :] >= jnp.arange(N)[:, None]
        )
        sel = jnp.asarray(np.eye(N, dtype=np.float32))[idx]  # (N, N-1, N)
        others = jnp.einsum("ikn,n->ik", sel, pos)
        out = dict(state)
        out["pos"] = pos
        out[f"{_OBS}_pos"] = pos[:, None]
        out[f"{_OBS}_others"] = others
        out[_REWARDS] = -jnp.abs(pos)
        out[Constants.TIMESTEP] = t
        out[Constants.DONE] = jnp.where(
            t >= self.episode_length, 1, 0
        ).astype(jnp.int32)
        return out


def test_shared_dict_obs_placeholders_and_training(tmp_path):
    eng = EnvEngine(env_obj=MiniDictObsEnv(), num_envs=4, seed=2)
    assert eng.obs_mode == "dict" and eng.obs_keys == ["pos", "others"]
    assert eng.state[f"{_OBS}_pos"].shape == (4, 3, 1)
    assert eng.state[f"{_OBS}_others"].shape == (4, 3, 2)

    cfg = {
        "name": "mini_dict",
        "env": {},
        "trainer": {"num_envs": 4, "num_episodes": 40,
                    "train_batch_size": 32, "seed": 1},
        "policy": {"shared": {"to_train": True, "algorithm": "A2C",
                              "gamma": 0.9, "lr": 0.01,
                              "model": {"type": "fully_connected",
                                        "fc_dims": [16]}}},
        "saving": {"metrics_log_freq": 5, "model_params_save_freq": 1000},
    }
    tr = TrainerA2C(env_wrapper=eng, config=cfg, verbose=False,
                    results_dir=str(tmp_path / "r"))
    # flattened obs = 1 (pos) + 2 (others)
    assert tr.params["shared"]["params"]["Dense_0"]["kernel"].shape[0] == 3
    tr.train()
    rew, steps = tr.evaluate_episodes()
    assert np.isfinite(rew["shared"]).all()
    # obs concat order matches obs_keys order: [pos, others]
    state = {k: jnp.asarray(v) for k, v in eng.state.items()}
    obs, mask = tr._policy_obs_and_mask(state, None, "shared")
    np.testing.assert_allclose(
        np.asarray(obs[..., 0:1]), np.asarray(state[f"{_OBS}_pos"])
    )
    np.testing.assert_allclose(
        np.asarray(obs[..., 1:]), np.asarray(state[f"{_OBS}_others"])
    )
    assert mask is None


class MiniLastDimEnv(TpuEnvironmentContext):
    """2 agents whose obs array is written agent-dim-LAST: (feat=3, agents)."""

    num_agents = 2
    episode_length = 6
    name = "MiniLastDimEnv"

    def __init__(self):
        self.action_space = {a: Discrete(2) for a in range(self.num_agents)}
        self.observation_space = None
        self.x = None

    def _feat(self, x):
        return np.stack([x, 2.0 * x, x**2], axis=0)  # (3, A)

    def reset(self):
        self.x = np.array([0.5, -0.5], dtype=np.float32)
        feat = self._feat(self.x)
        # per-agent obs is (3,); the engine stores it agent-dim-last
        return {a: feat[:, a] for a in range(self.num_agents)}

    def get_data_dictionary(self):
        feed = DataFeed()
        feed.add_data("x", self.x, save_copy_and_apply_at_reset=True)
        return feed

    def step_fn(self, state):
        t = state[Constants.TIMESTEP] + 1
        act = state[_ACTIONS][:, 0].astype(jnp.float32)
        x = state["x"] + 0.1 * (act - 0.5)
        out = dict(state)
        out["x"] = x
        # obs written agent-dim-LAST: (3, A)
        out[_OBS] = jnp.stack([x, 2.0 * x, x**2], axis=0)
        out[_REWARDS] = -jnp.abs(x)
        out[Constants.TIMESTEP] = t
        out[Constants.DONE] = jnp.where(
            t >= self.episode_length, 1, 0
        ).astype(jnp.int32)
        return out


def test_obs_dim_corresponding_to_num_agents_last(tmp_path):
    eng = EnvEngine(
        env_obj=MiniLastDimEnv(), num_envs=3, seed=4,
        obs_dim_corresponding_to_num_agents="last",
    )
    # placeholder stored agent-dim-last: (envs, feat, agents)
    assert eng.state[_OBS].shape == (3, 3, 2)

    cfg = {
        "name": "mini_last",
        "env": {},
        "trainer": {"num_envs": 3, "num_episodes": 24,
                    "train_batch_size": 18, "seed": 6},
        "policy": {"shared": {"to_train": True, "algorithm": "A2C",
                              "gamma": 0.9, "lr": 0.01,
                              "model": {"type": "fully_connected",
                                        "fc_dims": [8]}}},
        "saving": {"metrics_log_freq": 4, "model_params_save_freq": 1000},
    }
    tr = TrainerA2C(
        env_wrapper=eng, config=cfg, verbose=False,
        obs_dim_corresponding_to_num_agents="last",
        results_dir=str(tmp_path / "r"),
    )
    # the permutation must reconstruct each agent's (3,) feature vector
    state = {k: jnp.asarray(v) for k, v in eng.state.items()}
    obs, _ = tr._policy_obs_and_mask(state, None, "shared")
    assert obs.shape == (3, 2, 3)
    stored = np.asarray(state[_OBS])  # (E, 3, A)
    np.testing.assert_allclose(np.asarray(obs), np.swapaxes(stored, 1, 2))
    tr.train()
    rew, _ = tr.evaluate_episodes()
    assert np.isfinite(rew["shared"]).all()


def test_trainer_engine_flag_mismatch_raises(tmp_path):
    eng = EnvEngine(env_obj=MiniDictObsEnv(), num_envs=2, seed=2)
    cfg = {
        "name": "mini", "env": {},
        "trainer": {"num_envs": 2, "num_episodes": 10,
                    "train_batch_size": 8, "seed": 1},
        "policy": {"shared": {"to_train": True,
                              "model": {"type": "fully_connected",
                                        "fc_dims": [8]}}},
        "saving": {},
    }
    import pytest

    with pytest.raises(ValueError, match="separate"):
        TrainerA2C(
            env_wrapper=eng, config=cfg, verbose=False,
            create_separate_placeholders_for_each_policy=True,
            results_dir=str(tmp_path / "x"),
        )
