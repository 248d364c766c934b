"""
CartPole-v1 environment (numpy reference + pure-JAX TPU step).

Dynamics follow the classic OpenAI-gym cart-pole with the Euler kinematics
integrator, matching the reference env pair
``example_envs/single_agent/classic_control/cartpole/cartpole.py`` (numpy via
``gym.envs.classic_control.CartPoleEnv``) and
``cartpole_step_numba.py:5-83`` (the per-thread CUDA kernel).  Here the TPU
step is one vectorized pure function over the 4-dim state; the engine vmaps it
across replicas so 100k replicas are a single fused XLA program.

Reward is +1 every step (including the terminating one); ``done=1`` on pole
fall, cart out of bounds, or episode end (``cartpole_step_numba.py:75-83``).
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
from warpdrive_tpu.utils.spaces import Box, Discrete

_OBS = Constants.OBSERVATIONS
_ACTIONS = Constants.ACTIONS
_REWARDS = Constants.REWARDS

# Physical constants of the classic cart-pole.
GRAVITY = 9.8
MASSCART = 1.0
MASSPOLE = 0.1
TOTAL_MASS = MASSPOLE + MASSCART
LENGTH = 0.5  # half the pole's length
POLEMASS_LENGTH = MASSPOLE * LENGTH
FORCE_MAG = 10.0
TAU = 0.02
THETA_THRESHOLD_RADIANS = 12 * 2 * np.pi / 360
X_THRESHOLD = 2.4


def _cartpole_dynamics(x, x_dot, theta, theta_dot, force, np_mod):
    """One Euler step of the cart-pole ODE (shared by numpy and jax paths)."""
    costheta = np_mod.cos(theta)
    sintheta = np_mod.sin(theta)
    temp = (force + POLEMASS_LENGTH * theta_dot**2 * sintheta) / TOTAL_MASS
    thetaacc = (GRAVITY * sintheta - costheta * temp) / (
        LENGTH * (4.0 / 3.0 - MASSPOLE * costheta**2 / TOTAL_MASS)
    )
    xacc = temp - POLEMASS_LENGTH * thetaacc * costheta / TOTAL_MASS
    x = x + TAU * x_dot
    x_dot = x_dot + TAU * xacc
    theta = theta + TAU * theta_dot
    theta_dot = theta_dot + TAU * thetaacc
    return x, x_dot, theta, theta_dot


class ClassicControlCartPoleEnv(SingleAgentEnv):
    """Numpy reference implementation (gym-parity dynamics, float32)."""

    name = "ClassicControlCartPoleEnv"

    def __init__(self, episode_length=500, env_backend="cpu", reset_pool_size=0,
                 seed=None):
        super().__init__(episode_length, env_backend, reset_pool_size, seed=seed)
        self.action_space = map_to_single_agent(Discrete(2))
        self.observation_space = map_to_single_agent(
            Box(-np.inf, np.inf, shape=(4,), dtype=np.float32)
        )
        self.state = None

    def _sample_initial_state(self) -> np.ndarray:
        return self.np_random.uniform(low=-0.05, high=0.05, size=(4,)).astype(
            np.float32
        )

    def reset(self):
        self.timestep = 0
        if self.reset_pool_size < 2:
            # fixed initial state for every reset (reference cartpole.py:40-46)
            self.np_random = np.random.RandomState(self.seed)
        self.state = self._sample_initial_state()
        return map_to_single_agent(self.state.copy())

    def step(self, action=None):
        self.timestep += 1
        action = get_action_for_single_agent(action)
        if isinstance(action, np.ndarray):
            action = int(action.reshape(-1)[0])
        force = FORCE_MAG if action > 0.5 else -FORCE_MAG
        x, x_dot, theta, theta_dot = (np.float32(v) for v in self.state)
        x, x_dot, theta, theta_dot = _cartpole_dynamics(
            x, x_dot, theta, theta_dot, np.float32(force), np
        )
        self.state = np.array([x, x_dot, theta, theta_dot], dtype=np.float32)
        terminated = bool(
            x < -X_THRESHOLD
            or x > X_THRESHOLD
            or theta < -THETA_THRESHOLD_RADIANS
            or theta > THETA_THRESHOLD_RADIANS
        )
        obs = map_to_single_agent(self.state.copy())
        rew = map_to_single_agent(1.0)
        done = {"__all__": self.timestep >= self.episode_length or terminated}
        return obs, rew, done, {}


class TpuClassicControlCartPoleEnv(ClassicControlCartPoleEnv, TpuEnvironmentContext):
    def observe_fn(self, state: dict):
        """Pure observation from state (single replica).  Lets the engine
        refresh the obs placeholder after POOL resets, where restoring the
        fixed at-reset snapshot would leave obs stale w.r.t. the pooled
        state (bug exposed by the pool-lockstep consistency checker)."""
        return state["state"].astype(jnp.float32)

    """TPU version: a pure-JAX step function on the (1, 4) state array."""

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
        ``step_fn`` on (E,)-sliced state variables — env axis on the TPU
        lanes instead of the width-4 trailing state axis (see
        ``EnvEngine`` step_batch_fn hook).  Bitwise identical per
        element."""
        s = state["state"]  # (E, 1, 4)
        E = s.shape[0]
        action = state[_ACTIONS].reshape(E)
        t = state[Constants.TIMESTEP] + 1  # (E,)

        force = jnp.where(action > 0.5, FORCE_MAG, -FORCE_MAG).astype(
            jnp.float32
        )
        x, x_dot, theta, theta_dot = (
            s[:, 0, 0], s[:, 0, 1], s[:, 0, 2], s[:, 0, 3]
        )
        x, x_dot, theta, theta_dot = _cartpole_dynamics(
            x, x_dot, theta, theta_dot, force, jnp
        )
        new_s = jnp.stack([x, x_dot, theta, theta_dot], axis=1)[:, None, :]

        terminated = (
            (x < -X_THRESHOLD)
            | (x > X_THRESHOLD)
            | (theta < -THETA_THRESHOLD_RADIANS)
            | (theta > THETA_THRESHOLD_RADIANS)
        )
        done = jnp.where(
            (t >= self.episode_length) | terminated, 1, 0
        ).astype(jnp.int32)

        out = dict(state)
        out["state"] = new_s.astype(jnp.float32)
        out[_OBS] = new_s.astype(jnp.float32)
        out[_REWARDS] = jnp.ones((E, 1), dtype=jnp.float32)
        out[Constants.TIMESTEP] = t
        out[Constants.DONE] = done
        return out

    def step_fn(self, state: dict) -> dict:
        s = state["state"]  # (1, 4) float32
        action = state[_ACTIONS][0, 0]
        t = state[Constants.TIMESTEP] + 1

        force = jnp.where(action > 0.5, FORCE_MAG, -FORCE_MAG).astype(jnp.float32)
        x, x_dot, theta, theta_dot = s[0, 0], s[0, 1], s[0, 2], s[0, 3]
        x, x_dot, theta, theta_dot = _cartpole_dynamics(
            x, x_dot, theta, theta_dot, force, jnp
        )
        new_s = jnp.stack([x, x_dot, theta, theta_dot])[None, :]

        terminated = (
            (x < -X_THRESHOLD)
            | (x > X_THRESHOLD)
            | (theta < -THETA_THRESHOLD_RADIANS)
            | (theta > THETA_THRESHOLD_RADIANS)
        )
        done = jnp.where(
            (t >= self.episode_length) | terminated, 1, 0
        ).astype(jnp.int32)

        out = dict(state)
        out["state"] = new_s
        out[_OBS] = new_s
        out[_REWARDS] = jnp.ones((1,), dtype=jnp.float32)
        out[Constants.TIMESTEP] = t
        out[Constants.DONE] = done
        return out


env_registrar.add(ClassicControlCartPoleEnv, backend="cpu")
env_registrar.add(TpuClassicControlCartPoleEnv, backend="tpu")
