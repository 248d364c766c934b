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
from warpdrive_tpu.utils.argument_fix import Argfix
from warpdrive_tpu.core.state import StateStore
from warpdrive_tpu.envs.base import TpuEnvironmentContext
from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.env_registrar import env_registrar as default_registrar
from warpdrive_tpu.utils.spaces import Box

_OBS = Constants.OBSERVATIONS
_ACTIONS = Constants.ACTIONS
_REWARDS = Constants.REWARDS


def _infer_agent_space(example_obs):
    """Box for array obs; DictSpace of Boxes for dict obs."""
    from warpdrive_tpu.utils.spaces import recursive_obs_dict_to_spaces_dict

    if isinstance(example_obs, dict):
        return recursive_obs_dict_to_spaces_dict(example_obs)
    arr = np.asarray(example_obs)
    return Box(-np.inf, np.inf, shape=arr.shape)


class EnvEngine:
    """Vectorized TPU environment engine over ``num_envs`` replicas."""

    # back-compat rename, mirroring reference ``env_wrapper.py:45``
    @Argfix(old_name="use_cuda", new_name="env_backend")
    def __init__(
        self,
        env_obj: TpuEnvironmentContext = None,
        env_name: str = None,
        env_config: dict = None,
        num_envs: int = 2,
        env_backend: str = "tpu",
        env_registrar=None,
        seed: int = 0,
        policy_tag_to_agent_id_map: dict = None,
        create_separate_placeholders_for_each_policy: bool = False,
        obs_dim_corresponding_to_num_agents: str = "first",
    ):
        if isinstance(env_backend, bool):
            # the reference's deprecated ``use_cuda`` was a BOOL; the Argfix
            # rename forwards it here, so interpret True as the accelerator
            # backend (False would be the numpy/CPU engine)
            env_backend = "tpu" if env_backend else "cpu"
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
                aid: _infer_agent_space(obs[aid]) for aid in self._agent_ids
            }
        # gym interop: envs may declare real gym/gymnasium spaces
        # (reference env_wrapper.py:107-112); normalize once at the boundary
        # so everything downstream sees only native space types
        from warpdrive_tpu.utils.spaces import normalize_space_map

        self.action_space = normalize_space_map(self.env.action_space)
        self.observation_space = normalize_space_map(
            self.env.observation_space
        )

        # --- placeholder-mode bookkeeping (reference data_loader.py:30-267) -
        self.create_separate_placeholders_for_each_policy = bool(
            create_separate_placeholders_for_each_policy
        )
        self.separate_placeholders = self.create_separate_placeholders_for_each_policy
        self.obs_dim_corresponding_to_num_agents = obs_dim_corresponding_to_num_agents
        if policy_tag_to_agent_id_map is not None:
            self._policy_ids = {
                tag: np.asarray(sorted(int(i) for i in ids), dtype=np.int32)
                for tag, ids in policy_tag_to_agent_id_map.items()
            }
            # groups must be disjoint (an overlapping agent would take
            # whichever policy's reward/action was written last) and, in
            # separate-placeholder mode, cover every agent (unmapped agents
            # would silently read zero rewards from rewards_of)
            all_ids = np.concatenate(list(self._policy_ids.values()))
            assert len(all_ids) == len(set(all_ids.tolist())), (
                "policy_tag_to_agent_id_map groups overlap"
            )
            if create_separate_placeholders_for_each_policy:
                assert set(all_ids.tolist()) == set(range(self.n_agents)), (
                    "separate-placeholder mode requires the policy map to "
                    f"cover all {self.n_agents} agents; got {sorted(all_ids)}"
                )
        else:
            self._policy_ids = None
        if self.separate_placeholders:
            assert self._policy_ids is not None, (
                "create_separate_placeholders_for_each_policy requires "
                "policy_tag_to_agent_id_map at engine construction"
            )

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

        # observation/action/reward placeholders (shared or per-policy,
        # Box or Dict obs) — reference ``data_loader.py:30-267``
        from warpdrive_tpu.training.data_loader import (
            create_and_push_data_placeholders,
        )

        placeholder_meta = create_and_push_data_placeholders(
            self.store,
            obs,
            self.observation_space,
            self.action_space,
            policy_tag_to_agent_id_map={
                tag: ids.tolist() for tag, ids in (self._policy_ids or {}).items()
            }
            if self._policy_ids is not None
            else None,
            create_separate_placeholders_for_each_policy=self.separate_placeholders,
            obs_dim_corresponding_to_num_agents=(
                self.obs_dim_corresponding_to_num_agents
            ),
        )
        self.placeholder_groups = placeholder_meta["groups"]
        shared_group = self.placeholder_groups.get(None)
        # shared-mode conveniences (None when separate placeholders are used)
        self.obs_mode = shared_group["mode"] if shared_group else None
        self.obs_keys = shared_group["keys"] if shared_group else None
        self.num_action_types = (
            shared_group["action"][0] if shared_group else None
        )

        # --- pure compiled programs -----------------------------------------
        base_auto_reset = make_auto_reset_fn(
            self.store.snapshot, self.store.pools
        )
        observe_single_for_reset = getattr(self.env, "observe_fn", None)
        if (
            self.store.pools
            and observe_single_for_reset is not None
            and self.obs_mode == "box"
            and not self.separate_placeholders
        ):
            # POOL resets draw a random state row, but the generic reset
            # restores the obs placeholder from the FIXED snapshot — which
            # would leave one step of stale observations after every pool
            # reset (found by the pool-lockstep consistency checker).
            # Refresh obs from the env's pure observe_fn for reset envs.
            def auto_reset(state, key, force=False):
                done = state[Constants.DONE] > 0
                if force:
                    done = jnp.ones_like(done)
                new_state = base_auto_reset(state, key, force=force)
                if _OBS in new_state:
                    fresh = jax.vmap(observe_single_for_reset)(dict(new_state))
                    mask = done.reshape(
                        done.shape + (1,) * (fresh.ndim - 1)
                    )
                    new_state[_OBS] = jnp.where(mask, fresh, new_state[_OBS])
                return new_state

            self.auto_reset = auto_reset
        else:
            if self.store.pools:
                # Without the refresh above, every pool reset would serve
                # ONE step of observations computed from the fixed snapshot
                # while the physical state is a random pool row — reject
                # loudly instead of silently training on stale obs.
                raise NotImplementedError(
                    "reset pools currently require the shared Box "
                    "observations placeholder and an env observe_fn (the "
                    "post-reset obs refresh is only implemented there); "
                    f"got obs_mode={self.obs_mode!r}, separate_placeholders"
                    f"={self.separate_placeholders}, observe_fn="
                    f"{observe_single_for_reset is not None}"
                )
            self.auto_reset = base_auto_reset

        env_step_single = self.env.step_fn

        def write_actions(state: dict, actions) -> dict:
            """Write sampled actions into the placeholder(s).

            ``actions`` is (envs, agents[, C]) covering ALL agents, or — in
            separate-placeholder mode — a dict ``{policy_tag: (envs, A_p,
            C)}`` (reference env kernels read ``sampled_actions_<policy>``
            arrays, ``data_loader.py:420-509``)."""
            state = dict(state)
            if self.separate_placeholders:
                if isinstance(actions, dict):
                    for tag, a in actions.items():
                        a = jnp.asarray(a)
                        if a.ndim == 2:
                            a = a[..., None]
                        name = f"{_ACTIONS}_{tag}"
                        state[name] = a.astype(state[name].dtype)
                else:
                    a = jnp.asarray(actions)
                    if a.ndim == 2:
                        a = a[..., None]
                    for tag, ids in self._policy_ids.items():
                        name = f"{_ACTIONS}_{tag}"
                        C = state[name].shape[-1]
                        state[name] = jnp.take(a, jnp.asarray(ids), axis=1)[
                            ..., :C
                        ].astype(state[name].dtype)
            else:
                a = jnp.asarray(actions)
                if a.ndim == 2:  # (envs, agents) -> add action-type axis
                    a = a[..., None]
                state[_ACTIONS] = a.astype(state[_ACTIONS].dtype)
            return state

        def step(state: dict, actions=None) -> dict:
            """Pure batched step: write actions placeholder(s), vmap the env."""
            if actions is not None:
                state = write_actions(state, actions)
            return jax.vmap(env_step_single)(dict(state))

        self.write_actions = write_actions
        self.step = step
        self._jit_step = jax.jit(step)

        # --- batched-step override (round 5): an env may provide
        # ``step_batch_fn(state) -> state`` operating on the full (E, ...)
        # batch directly.  Motivation is TPU memory layout: per-agent
        # state arrays are (E, n_agents, ...) and the trailing agent axis
        # becomes the LANE axis — a single-agent env therefore runs every
        # elementwise physics op at 1/128 lane utilization under the
        # vmapped per-replica step (measured: the Pendulum rollout's
        # fused trig chain at 11 GB/s, ~1/64 of VPU-practical, round-5
        # DDPG trace).  A batched step can slice state variables to (E,)
        # vectors (env axis on lanes) and run the same arithmetic at full
        # width — bitwise identical per element, layout-only.
        step_batch = getattr(self.env, "step_batch_fn", None)
        if step_batch is not None:
            def step_batched_direct(state: dict, actions=None) -> dict:
                if actions is not None:
                    state = write_actions(state, actions)
                return step_batch(dict(state))

            self.step = step_batched_direct
            self._jit_step = jax.jit(step_batched_direct)

        # --- split-step fast path (see TpuEnvironmentContext): physics and
        # observation as separate vmapped pure functions, so trainers can
        # carry only the physical state and let XLA fuse the observation
        # build straight into the policy forward.  (Currently implemented by
        # shared-placeholder Box-obs envs; dict/separate envs use the full
        # step path.) --------------------------------------------------------
        self.has_split_step = bool(getattr(self.env, "has_split_step", False))
        if self.has_split_step:
            assert self.obs_mode == "box" and not self.separate_placeholders, (
                "split-step fast path currently requires the shared Box "
                "observations placeholder"
            )
            physics_single = self.env.physics_fn
            observe_single = self.env.observe_fn
            act_dtype_ = np.dtype(shared_group["action"][1])

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

            if observe_batch is not None:
                # the env provides a BATCHED observe (e.g. the fused Mosaic
                # kNN kernel): compose the full step from it too, so
                # step_all_envs / the consistency oracle exercise the SAME
                # observation path production rollouts run (vmapped
                # per-replica observe_fn may intentionally fall back to a
                # reference algorithm — tag_continuous.py pallas* modes)
                def step_batched(state: dict, actions=None) -> dict:
                    # split-step => shared Box obs placeholder (asserted
                    # above), so the obs array name is Constants.OBSERVATIONS
                    if actions is not None:
                        state = write_actions(state, actions)
                    out = step_physics(state, state[_ACTIONS])
                    out[_OBS] = observe_batch(dict(out)).astype(
                        out[_OBS].dtype
                    )
                    return out

                self.step = step_batched
                self._jit_step = jax.jit(step_batched)
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

    # ------------------------------------------------- placeholder name maps
    def group_info(self, tag: str = None) -> dict:
        """Placeholder-group metadata ``{"mode", "keys", "action"}`` for a
        policy tag (separate mode) or the shared group."""
        if self.separate_placeholders:
            assert tag is not None, "separate mode needs a policy tag"
            return self.placeholder_groups[tag]
        return self.placeholder_groups[None]

    def obs_entry_names(self, tag: str = None) -> list:
        """State-array names holding observations: ``observations`` /
        ``observations_<key>`` (shared) or ``observations_<tag>[_<key>]``
        (separate mode; ``tag`` required)."""
        group = self.group_info(tag)
        suffix = f"_{tag}" if self.separate_placeholders else ""
        if group["mode"] == "box":
            return [_OBS + suffix]
        return [f"{_OBS}{suffix}_{key}" for key in group["keys"]]

    def reward_entry_names(self) -> list:
        if self.separate_placeholders:
            return [f"{_REWARDS}_{tag}" for tag in sorted(self._policy_ids)]
        return [_REWARDS]

    def rewards_of(self, state: dict) -> jnp.ndarray:
        """All-agent rewards (envs, n_agents); separate-mode per-policy
        arrays are scatter-merged on the agent axis."""
        if not self.separate_placeholders:
            return state[_REWARDS]
        out = jnp.zeros((self.n_envs, self.n_agents), jnp.float32)
        for tag, ids in self._policy_ids.items():
            out = out.at[:, jnp.asarray(ids)].set(state[f"{_REWARDS}_{tag}"])
        return out

    def _obs_names(self) -> list:
        """All obs placeholder state names, across groups."""
        if self.separate_placeholders:
            names = []
            for tag in sorted(self._policy_ids):
                names += self.obs_entry_names(tag)
            return names
        return self.obs_entry_names()

    def _obs_view(self) -> "np.ndarray | dict":
        """Host view of the obs placeholders: one array for the shared-Box
        mode, else ``{state_name: array}`` (cross-process safe: sharded
        arrays all-gather in a multi-process run)."""
        from warpdrive_tpu.parallel.mesh import to_host

        if self.obs_mode == "box" and not self.separate_placeholders:
            return to_host(self.state[_OBS])
        return {name: to_host(self.state[name]) for name in self._obs_names()}

    # ------------------------------------------------------- stateful facade
    def _next_key(self):
        self._host_key, sub = jax.random.split(self._host_key)
        return sub

    def reset_all_envs(self):
        """
        Force-reset every replica and return the batched observations
        (cf. reference ``env_wrapper.py:264-353``).  The very first call
        returns the initial state as-built (host reset already applied).
        Returns one (envs, agents, *feat) array in the default shared-Box
        mode, else a dict of obs placeholder arrays by state name.
        """
        if self._first_reset_done:
            self.state = self._jit_force_reset(self.state, self._next_key())
        self._first_reset_done = True
        return self._obs_view()

    def reset_only_done_envs(self):
        """Soft reset of finished replicas only (``env_wrapper.py:358-374``)."""
        assert self.env_backend == "tpu"
        self._first_reset_done = True  # a later reset() must force-reset
        self.state = self._jit_done_reset(self.state, self._next_key())

    def step_all_envs(self, actions) -> dict:
        """
        Step every replica with ``actions`` of shape (envs, agents[,A]) —
        or, in separate-placeholder mode, a dict ``{policy: (envs, A_p, C)}``
        — and return views of obs/rew/done (``env_wrapper.py:380-390``).
        """
        assert self.env_backend == "tpu"
        # once stepped, reset() may no longer treat the state as pristine
        self._first_reset_done = True
        if not isinstance(actions, dict):
            actions = jnp.asarray(actions)
        self.state = self._jit_step(self.state, actions)
        out = {Constants.DONE: self.state[Constants.DONE]}
        # device arrays in every mode (no forced host transfer per step;
        # callers np.asarray when they want host copies)
        for name in self._obs_names():
            out[name] = self.state[name]
        for name in self.reward_entry_names():
            out[name] = self.state[name]
        return out

    # gym-style aliases (reference env_wrapper.py:398-408)
    def reset(self):
        return self.reset_all_envs()

    def obs_at_reset(self):
        """Single-env at-reset observation(s) (reference
        ``env_wrapper.py:392-396``)."""
        if self.obs_mode == "box" and not self.separate_placeholders:
            return np.asarray(self.store.snapshot[_OBS])
        names = []
        if self.separate_placeholders:
            for tag in sorted(self._policy_ids):
                names += self.obs_entry_names(tag)
        else:
            names = self.obs_entry_names()
        return {name: np.asarray(self.store.snapshot[name]) for name in names}
