"""
DummyEnv: the minimal test environment.

Capability parity with the reference's dummy test kernel
(``example_envs/dummy_env/test_step.cu:9-46`` and ``test_step_numba.py``),
which exists to exercise the framework plumbing itself: state transfer and
in-place updates (``x /= multiplier``, ``y *= multiplier``), an
atomically-reduced "reach target" condition setting the done flag, and the
action placeholder being written (the CUDA kernel fills ``actions`` with
``0..action_dim-1``).  The TPU version expresses the same semantics as a
vectorized pure function: the shared-memory/atomicAdd reduction over agents
becomes a plain ``any`` reduction.

Used by tutorial-style smoke tests and available from the registrar as
``DummyEnv``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from warpdrive_tpu.envs.base import TpuEnvironmentContext
from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.data_feed import DataFeed
from warpdrive_tpu.utils.env_registrar import env_registrar
from warpdrive_tpu.utils.spaces import Discrete

_ACTIONS = Constants.ACTIONS
_OBS = Constants.OBSERVATIONS
_REWARDS = Constants.REWARDS


class DummyEnv:
    """Numpy reference of the dummy test env."""

    name = "DummyEnv"

    def __init__(self, num_agents=5, episode_length=3, multiplier=2.0,
                 target=100, seed=None):
        self.num_agents = int(num_agents)
        self.episode_length = int(episode_length)
        self.multiplier = float(multiplier)
        self.target = int(target)
        self.np_random = np.random.RandomState(seed)
        self.action_space = {a: Discrete(3) for a in range(self.num_agents)}
        self.observation_space = None
        self.x = None
        self.y = None
        self.timestep = None

    def _obs(self):
        return {
            a: np.array([self.x[a], float(self.y[a])], dtype=np.float32)
            for a in range(self.num_agents)
        }

    def reset(self):
        self.timestep = 0
        self.x = np.full(self.num_agents, 2.0**self.episode_length,
                         dtype=np.float32)
        self.y = np.arange(1, self.num_agents + 1, dtype=np.int32)
        return self._obs()

    def step(self, actions=None):
        self.timestep += 1
        self.x = self.x / self.multiplier
        self.y = (self.y * self.multiplier).astype(np.int32)
        reach = bool((self.y >= self.target).any())
        obs = self._obs()
        rew = {a: 0.0 for a in range(self.num_agents)}
        done = {"__all__": self.timestep >= self.episode_length or reach}
        return obs, rew, done, {}


class TpuDummyEnv(DummyEnv, TpuEnvironmentContext):
    """TPU step: the reference kernel's semantics as one pure function."""

    def get_data_dictionary(self) -> DataFeed:
        data = DataFeed()
        data.add_data("x", self.x, save_copy_and_apply_at_reset=True)
        data.add_data("y", self.y, save_copy_and_apply_at_reset=True)
        return data

    def step_fn(self, state: dict) -> dict:
        t = state[Constants.TIMESTEP] + 1
        x = state["x"] / self.multiplier
        y = (state["y"] * self.multiplier).astype(jnp.int32)
        # the CUDA kernel's shared-memory atomicAdd reduction -> any()
        reach = (y >= self.target).any()
        out = dict(state)
        out["x"] = x
        out["y"] = y
        out[_OBS] = jnp.stack([x, y.astype(jnp.float32)], axis=1)
        out[_REWARDS] = jnp.zeros((self.num_agents,), jnp.float32)
        out[Constants.TIMESTEP] = t
        out[Constants.DONE] = jnp.where(
            (t >= self.episode_length) | reach, 1, 0
        ).astype(jnp.int32)
        return out


env_registrar.add(DummyEnv, backend="cpu")
env_registrar.add(TpuDummyEnv, backend="tpu", name="DummyEnv")
