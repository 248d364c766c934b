"""
Pendulum environment (continuous torque).

Matches the reference pair
``example_envs/single_agent/classic_control/pendulum/*`` and the numba kernel
``pendulum_step_numba.py:31-74``: cost computed on the PRE-step angle, reward
``-(angle_norm(th)^2 + 0.1 thdot^2 + 0.001 u^2)``, obs ``(cos th, sin th,
thdot)``, done only at episode end.  Note the kernel uses g = 9.81.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from warpdrive_tpu.envs.base import TpuEnvironmentContext
from warpdrive_tpu.envs.classic_control.base import (
    SingleAgentEnv,
    get_action_for_single_agent,
    map_to_single_agent,
)
from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.data_feed import DataFeed
from warpdrive_tpu.utils.env_registrar import env_registrar
from warpdrive_tpu.utils.spaces import Box

_OBS = Constants.OBSERVATIONS
_ACTIONS = Constants.ACTIONS
_REWARDS = Constants.REWARDS

MAX_SPEED = 8.0
MAX_TORQUE = 2.0
DT = 0.05
G = 9.81
M = 1.0
L = 1.0


def _angle_normalize(x, np_mod):
    return ((x + np.pi) % (2 * np.pi)) - np.pi


class ClassicControlPendulumEnv(SingleAgentEnv):
    """Numpy reference implementation (float32)."""

    name = "ClassicControlPendulumEnv"

    def __init__(self, episode_length=500, env_backend="cpu", reset_pool_size=0,
                 seed=None):
        super().__init__(episode_length, env_backend, reset_pool_size, seed=seed)
        self.action_space = map_to_single_agent(
            Box(-MAX_TORQUE, MAX_TORQUE, shape=(1,), dtype=np.float32)
        )
        self.observation_space = map_to_single_agent(
            Box(-np.inf, np.inf, shape=(3,), dtype=np.float32)
        )
        self.state = None  # (theta, theta_dot)

    def _sample_initial_state(self) -> np.ndarray:
        th = self.np_random.uniform(low=-np.pi, high=np.pi)
        thdot = self.np_random.uniform(low=-1.0, high=1.0)
        return np.array([th, thdot], dtype=np.float32)

    def _obs(self) -> np.ndarray:
        th, thdot = self.state
        return np.array([np.cos(th), np.sin(th), thdot], dtype=np.float32)

    def reset(self):
        self.timestep = 0
        if self.reset_pool_size < 2:
            self.np_random = np.random.RandomState(self.seed)
        self.state = self._sample_initial_state()
        return map_to_single_agent(self._obs())

    def _sync_obs(self):
        return map_to_single_agent(self._obs())

    def step(self, action=None):
        self.timestep += 1
        action = get_action_for_single_agent(action)
        u = np.clip(
            np.float32(np.asarray(action).reshape(-1)[0]), -MAX_TORQUE, MAX_TORQUE
        )
        th, thdot = (np.float32(v) for v in self.state)
        costs = (
            _angle_normalize(th, np) ** 2 + 0.1 * thdot**2 + 0.001 * (u**2)
        )
        newthdot = thdot + np.float32(
            (3 * G / (2 * L) * np.sin(th) + 3.0 / (M * L**2) * u) * DT
        )
        newthdot = np.clip(newthdot, -MAX_SPEED, MAX_SPEED).astype(np.float32)
        newth = np.float32(th + newthdot * DT)
        self.state = np.array([newth, newthdot], dtype=np.float32)
        obs = map_to_single_agent(self._obs())
        rew = map_to_single_agent(float(-costs))
        done = {"__all__": self.timestep >= self.episode_length}
        return obs, rew, done, {}


class TpuClassicControlPendulumEnv(
    ClassicControlPendulumEnv, TpuEnvironmentContext
):
    def observe_fn(self, state: dict):
        """Pure observation from state (single replica).  Lets the engine
        refresh the obs placeholder after POOL resets, where restoring the
        fixed at-reset snapshot would leave obs stale w.r.t. the pooled
        state (bug exposed by the pool-lockstep consistency checker)."""
        s = state["state"]
        th, thdot = s[0, 0], s[0, 1]
        return jnp.stack([jnp.cos(th), jnp.sin(th), thdot])[None, :].astype(
            jnp.float32
        )

    """TPU version (pure-JAX step on the (1, 2) (theta, theta_dot) state)."""

    def get_data_dictionary(self) -> DataFeed:
        data = DataFeed()
        assert self.state is not None, "call reset() before building the feed"
        data.add_data(
            name="state",
            data=np.atleast_2d(self.state),
            save_copy_and_apply_at_reset=self.reset_pool_size < 2,
        )
        return data

    def get_reset_pool_dictionary(self) -> DataFeed:
        pool = DataFeed()
        if self.reset_pool_size >= 2:
            states = np.stack(
                [
                    np.atleast_2d(self._sample_initial_state())
                    for _ in range(self.reset_pool_size)
                ],
                axis=0,
            )
            pool.add_pool_for_reset("state_reset_pool", states, reset_target="state")
        return pool

    def step_batch_fn(self, state: dict) -> dict:
        """Lane-packed batched step (round 5): the same arithmetic as
        ``step_fn`` on (E,)-sliced state variables, so the env axis rides
        the TPU lanes instead of the width-1 agent axis (the vmapped
        per-replica step ran the fused trig chain at 1/128 lane
        utilization — see ``EnvEngine`` step_batch_fn hook).  Bitwise
        identical per element (same ops, same order)."""
        s = state["state"]  # (E, 1, 2)
        E = s.shape[0]
        action = state[_ACTIONS].reshape(E).astype(jnp.float32)
        t = state[Constants.TIMESTEP] + 1  # (E,)

        u = jnp.clip(action, -MAX_TORQUE, MAX_TORQUE)
        th = s[:, 0, 0]
        thdot = s[:, 0, 1]
        costs = _angle_normalize(th, jnp) ** 2 + 0.1 * thdot**2 + 0.001 * u**2
        newthdot = thdot + (
            3 * G / (2 * L) * jnp.sin(th) + 3.0 / (M * L**2) * u
        ) * DT
        newthdot = jnp.clip(newthdot, -MAX_SPEED, MAX_SPEED)
        newth = th + newthdot * DT
        new_s = jnp.stack([newth, newthdot], axis=1)[:, None, :]

        obs = jnp.stack(
            [jnp.cos(newth), jnp.sin(newth), newthdot], axis=1
        )[:, None, :]
        done = jnp.where(t >= self.episode_length, 1, 0).astype(jnp.int32)

        out = dict(state)
        out["state"] = new_s.astype(jnp.float32)
        out[_OBS] = obs.astype(jnp.float32)
        out[_REWARDS] = (-costs)[:, None].astype(jnp.float32)
        out[Constants.TIMESTEP] = t
        out[Constants.DONE] = done
        return out

    def step_fn(self, state: dict) -> dict:
        s = state["state"]
        action = state[_ACTIONS][0, 0].astype(jnp.float32)
        t = state[Constants.TIMESTEP] + 1

        u = jnp.clip(action, -MAX_TORQUE, MAX_TORQUE)
        th, thdot = s[0, 0], s[0, 1]
        costs = _angle_normalize(th, jnp) ** 2 + 0.1 * thdot**2 + 0.001 * u**2
        newthdot = thdot + (3 * G / (2 * L) * jnp.sin(th) + 3.0 / (M * L**2) * u) * DT
        newthdot = jnp.clip(newthdot, -MAX_SPEED, MAX_SPEED)
        newth = th + newthdot * DT
        new_s = jnp.stack([newth, newthdot])[None, :]

        obs = jnp.stack([jnp.cos(newth), jnp.sin(newth), newthdot])[None, :]
        done = jnp.where(t >= self.episode_length, 1, 0).astype(jnp.int32)

        out = dict(state)
        out["state"] = new_s
        out[_OBS] = obs
        out[_REWARDS] = (-costs)[None].astype(jnp.float32)
        out[Constants.TIMESTEP] = t
        out[Constants.DONE] = done
        return out


env_registrar.add(ClassicControlPendulumEnv, backend="cpu")
env_registrar.add(TpuClassicControlPendulumEnv, backend="tpu")
