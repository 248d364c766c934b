"""
EnvEngine: the vectorized, jit-compiled environment runtime.

This replaces the reference's ``EnvWrapper`` (``warp_drive/env_wrapper.py:46-408``)
plus its whole manager stack (``CUDAFunctionManager``/``CUDAFunctionFeed``/
``CUDAEnvironmentReset``): on TPU the nvcc templating, launch-geometry math
(block = agents, grid = envs; ``function_manager.py:64-67``) and pointer feeds
all collapse into ``jax.vmap`` over the env-replica axis of a state pytree and
``jax.jit`` over the composed program.

Responsibilities:

* build the batched state from the env's host-side reset + DataFeeds
  (first-reset replication, cf. reference ``env_wrapper.py:264-353``),
* create the canonical observation/action/reward placeholders (the shared
  -placeholder mode of reference ``data_loader.py:181-209``),
* expose PURE functions ``step`` and ``auto_reset`` for fusion into jitted
  training scans,
* offer stateful gym-like conveniences (``reset_all_envs``, ``step_all_envs``,
  ``reset_only_done_envs``) mirroring ``env_wrapper.py:264-408``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from warpdrive_tpu.core.reset import make_auto_reset_fn
from warpdrive_tpu.core.state import StateStore
from warpdrive_tpu.envs.base import TpuEnvironmentContext
from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.data_feed import DataFeed
from warpdrive_tpu.utils.env_registrar import env_registrar as default_registrar
from warpdrive_tpu.utils.spaces import Box, Discrete, MultiDiscrete

_OBS = Constants.OBSERVATIONS
_ACTIONS = Constants.ACTIONS
_REWARDS = Constants.REWARDS


def _stack_agent_obs(obs_dict: dict, agent_ids) -> np.ndarray:
    """Stack a gym-style per-agent obs dict into an (agents, *feat) array."""
    shapes = {np.asarray(obs_dict[aid]).shape for aid in agent_ids}
    if len(shapes) > 1:
        raise NotImplementedError(
            "heterogeneous per-agent observation shapes "
            f"({sorted(shapes)}) need per-policy state arrays (the "
            "reference's create_separate_placeholders_for_each_policy "
            "mode); pad observations to a common shape with an "
            "action_mask-style validity channel, or open the agent groups "
            "as separate envs"
        )
    return np.stack([np.asarray(obs_dict[aid]) for aid in agent_ids], axis=0)


class EnvEngine:
    """Vectorized TPU environment engine over ``num_envs`` replicas."""

    def __init__(
        self,
        env_obj: TpuEnvironmentContext = None,
        env_name: str = None,
        env_config: dict = None,
        num_envs: int = 2,
        env_backend: str = "tpu",
        env_registrar=None,
        seed: int = 0,
    ):
        assert env_backend == "tpu", (
            "EnvEngine compiles the TPU backend; for the numpy reference "
            "implementation instantiate the env class directly (as the "
            "consistency checker does); got " + repr(env_backend)
        )
        registrar = env_registrar or default_registrar
        if env_obj is None:
            assert env_name is not None, "pass env_obj or env_name"
            env_cls = registrar.get(env_name, backend=env_backend)
            env_obj = env_cls(**(env_config or {}))
        self.env = env_obj
        self.env_backend = env_backend
        self.n_envs = int(num_envs)
        self.n_agents = int(self.env.num_agents)
        self.episode_length = int(self.env.episode_length)
        self._seed = int(seed)

        # --- host-side first reset: infer spaces & initial obs -------------
        obs = self.env.reset()
        self._agent_ids = sorted(obs.keys())
        assert len(self._agent_ids) == self.n_agents
        if getattr(self.env, "observation_space", None) is None or not isinstance(
            self.env.observation_space, dict
        ):
            self.env.observation_space = {
                aid: Box(-np.inf, np.inf, shape=np.asarray(obs[aid]).shape)
                for aid in self._agent_ids
            }
        self.action_space = self.env.action_space
        self.observation_space = self.env.observation_space

        # --- build the batched device state ---------------------------------
        self.store = StateStore(
            num_envs=self.n_envs,
            num_agents=self.n_agents,
            episode_length=self.episode_length,
            seed=seed,
        )
        self.store.push(self.env.get_data_dictionary())
        self.store.push(self.env.get_tensor_dictionary())
        pool_feed = self.env.get_reset_pool_dictionary()
        if pool_feed:
            self.store.push(pool_feed)

        placeholder_feed = DataFeed()
        # observations placeholder, restored at reset (reference
        # data_loader.py:333-385 pushes obs with save_copy=True)
        stacked = _stack_agent_obs(obs, self._agent_ids).astype(np.float32)
        placeholder_feed.add_data(
            name=_OBS, data=stacked, save_copy_and_apply_at_reset=True
        )
        # rewards placeholder (reference data_loader.py:607-623)
        placeholder_feed.add_data(
            name=_REWARDS, data=np.zeros((self.n_agents,), dtype=np.float32)
        )
        # sampled-actions placeholder (reference data_loader.py:420-509)
        a_space = self.action_space[self._agent_ids[0]]
        if isinstance(a_space, Discrete):
            num_action_types, act_dtype = 1, np.int32
        elif isinstance(a_space, MultiDiscrete):
            num_action_types, act_dtype = len(a_space.nvec), np.int32
        elif isinstance(a_space, Box):
            num_action_types, act_dtype = int(a_space.shape[0]), np.float32
        else:
            raise NotImplementedError(f"unsupported action space {a_space!r}")
        self.num_action_types = num_action_types
        placeholder_feed.add_data(
            name=_ACTIONS,
            data=np.zeros((self.n_agents, num_action_types), dtype=act_dtype),
        )
        self.store.push(placeholder_feed)

        # --- pure compiled programs -----------------------------------------
        self.auto_reset = make_auto_reset_fn(self.store.snapshot, self.store.pools)

        env_step_single = self.env.step_fn

        def step(state: dict, actions=None) -> dict:
            """Pure batched step: write actions placeholder, vmap the env."""
            if actions is not None:
                actions = jnp.asarray(actions)
                if actions.ndim == 2:  # (envs, agents) -> add action-type axis
                    actions = actions[..., None]
                state = dict(state)
                state[_ACTIONS] = actions.astype(state[_ACTIONS].dtype)
            return jax.vmap(env_step_single)(state)

        self.step = step
        self._jit_step = jax.jit(step)

        # --- split-step fast path (see TpuEnvironmentContext): physics and
        # observation as separate vmapped pure functions, so trainers can
        # carry only the physical state and let XLA fuse the observation
        # build straight into the policy forward ---------------------------
        self.has_split_step = bool(getattr(self.env, "has_split_step", False))
        if self.has_split_step:
            physics_single = self.env.physics_fn
            observe_single = self.env.observe_fn
            act_dtype_ = act_dtype

            def step_physics(state: dict, actions) -> dict:
                actions = jnp.asarray(actions)
                if actions.ndim == 2:
                    actions = actions[..., None]
                return jax.vmap(physics_single)(
                    dict(state), actions.astype(act_dtype_)
                )

            observe_batch = getattr(self.env, "observe_batch_fn", None)

            def observe(state: dict) -> jnp.ndarray:
                if observe_batch is not None:
                    return observe_batch(dict(state))
                return jax.vmap(observe_single)(dict(state))

            self.step_physics = step_physics
            self.observe = observe
        else:
            self.step_physics = None
            self.observe = None
        self._jit_force_reset = jax.jit(
            lambda state, key: self.auto_reset(state, key, force=True)
        )
        self._jit_done_reset = jax.jit(
            lambda state, key: self.auto_reset(state, key, force=False)
        )

        self.state = self.store.state
        self._host_key = jax.random.PRNGKey(self._seed + 1_000_003)
        self._first_reset_done = False

    # ------------------------------------------------------- stateful facade
    def _next_key(self):
        self._host_key, sub = jax.random.split(self._host_key)
        return sub

    def reset_all_envs(self) -> np.ndarray:
        """
        Force-reset every replica and return the batched observations
        (cf. reference ``env_wrapper.py:264-353``).  The very first call
        returns the initial state as-built (host reset already applied).
        """
        if self._first_reset_done:
            self.state = self._jit_force_reset(self.state, self._next_key())
        self._first_reset_done = True
        return np.asarray(self.state[_OBS])

    def reset_only_done_envs(self):
        """Soft reset of finished replicas only (``env_wrapper.py:358-374``)."""
        assert self.env_backend == "tpu"
        self.state = self._jit_done_reset(self.state, self._next_key())

    def step_all_envs(self, actions) -> dict:
        """
        Step every replica with ``actions`` of shape (envs, agents[,A]) and
        return views of obs/rew/done (``env_wrapper.py:380-390``).
        """
        assert self.env_backend == "tpu"
        self.state = self._jit_step(self.state, jnp.asarray(actions))
        return {
            _OBS: self.state[_OBS],
            _REWARDS: self.state[_REWARDS],
            Constants.DONE: self.state[Constants.DONE],
        }

    # gym-style aliases (reference env_wrapper.py:398-408)
    def reset(self):
        return self.reset_all_envs()

    def obs_at_reset(self) -> np.ndarray:
        """Single-env at-reset observation (reference ``env_wrapper.py:392-396``)."""
        return np.asarray(self.store.snapshot[_OBS])
