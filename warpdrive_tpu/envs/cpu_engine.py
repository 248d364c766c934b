"""
CPU (pure-python) environment backend.

Parity with the reference's ``EnvWrapper(..., env_backend='cpu')``
(``env_wrapper.py:117-122``): run N independent python env objects — the
NUMPY REFERENCE implementations — behind the same engine facade, including
enough of the trainer contract (state dict, spaces, group metadata,
soft reset) that :class:`TrainerA2C` can train against it eagerly, exactly
like the reference trains on CPU envs.

Note the design difference from the TPU engine: the numpy envs are stateful
python objects, so there is no pure ``step`` to fuse into a jitted scan.
Trainers detect ``is_eager = True`` and run a per-step python rollout (the
reference's own hot-loop structure) while the model forward/sampling and
the whole loss/optimizer update remain jitted.  For running JAX envs on CPU
hosts, use the normal :class:`EnvEngine` under ``JAX_PLATFORMS=cpu`` — the
eager backend exists for debugging numpy references at the trainer level.

Env families with a native C++ batched stepper (``warpdrive_tpu.native``)
step the whole fleet in one C call instead of the per-env python loop
(``native="auto"``, the default, uses it when available; equivalence with
the python loop is asserted by ``tests/test_native_backend.py``).
"""

from __future__ import annotations

import numpy as np

from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.env_registrar import env_registrar as default_registrar
from warpdrive_tpu.utils.spaces import Box, Discrete, MultiDiscrete

_OBS = Constants.OBSERVATIONS
_REWARDS = Constants.REWARDS
_DONE = Constants.DONE
_TIMESTEP = Constants.TIMESTEP


class CpuEnvEngine:
    """N numpy reference envs behind the (eager) engine facade."""

    is_eager = True
    env_backend = "cpu"
    mesh = None
    has_split_step = False
    separate_placeholders = False
    create_separate_placeholders_for_each_policy = False
    obs_dim_corresponding_to_num_agents = "first"
    obs_keys = []
    obs_mode = "box"

    def __init__(
        self,
        env_obj=None,
        env_name: str = None,
        env_config: dict = None,
        num_envs: int = 2,
        env_registrar=None,
        seed: int = 0,
        native: bool | str = "auto",
    ):
        """``native``: use the C++ batched stepper (``warpdrive_tpu.native``)
        when one exists for this env family — one C call per fleet-step
        instead of a per-env python loop. ``"auto"`` (default) uses it when
        available and silently falls back; ``True`` requires it; ``False``
        forces the python loop."""
        registrar = env_registrar or default_registrar
        if env_obj is None:
            assert env_name is not None, "pass env_obj or env_name"
            env_cls = registrar.get(env_name, backend="cpu")
            self._make_env = lambda: env_cls(**(env_config or {}))
        elif env_config is not None:
            env_cls = type(env_obj)
            self._make_env = lambda: env_cls(**env_config)
        else:
            # no config to rebuild from: replicate the CONSTRUCTED object
            # (a fresh `type(env_obj)()` would silently drop its ctor args)
            import copy as _copy

            self._make_env = lambda: _copy.deepcopy(env_obj)
        self.envs = [self._make_env() for _ in range(num_envs)]
        self.env = self.envs[0]
        self.n_envs = int(num_envs)
        self.n_agents = int(self.env.num_agents)
        self.episode_length = int(self.env.episode_length)
        self._done = np.zeros((num_envs,), np.int32)
        self._timestep = np.zeros((num_envs,), np.int32)

        # spaces + placeholder metadata (Box obs only on the eager backend)
        obs0 = [env.reset() for env in self.envs]
        self._agent_ids = sorted(obs0[0].keys())
        first = obs0[0][self._agent_ids[0]]
        assert not isinstance(first, dict), (
            "the eager CPU backend supports Box observations; use EnvEngine "
            "under JAX_PLATFORMS=cpu for Dict-obs envs"
        )
        if getattr(self.env, "observation_space", None) is None or not isinstance(
            self.env.observation_space, dict
        ):
            self.env.observation_space = {
                aid: Box(-np.inf, np.inf, shape=np.asarray(obs0[0][aid]).shape)
                for aid in self._agent_ids
            }
        # gym interop (same boundary rule as EnvEngine)
        from warpdrive_tpu.utils.spaces import normalize_space_map

        self.observation_space = normalize_space_map(
            self.env.observation_space
        )
        self.action_space = normalize_space_map(self.env.action_space)
        a_space = self.action_space[self._agent_ids[0]]
        if isinstance(a_space, Discrete):
            spec = (1, np.int32)
        elif isinstance(a_space, MultiDiscrete):
            spec = (len(a_space.nvec), np.int32)
        elif isinstance(a_space, Box):
            spec = (int(a_space.shape[0]), np.float32)
        else:
            raise NotImplementedError(repr(a_space))
        self.num_action_types = spec[0]
        self._group = {"mode": "box", "keys": [], "action": spec}

        # native (C++) batched fast path: the adapter owns stacked state
        # arrays; python env objects remain the source of reset() semantics
        self._native = None
        if native:
            from warpdrive_tpu import native as native_mod

            adapter_cls = native_mod.adapter_for(self.env)
            if adapter_cls is not None:
                try:
                    self._native = adapter_cls(self.envs)
                except native_mod.NativeBuildError:
                    if native is True:
                        raise
            elif native is True:
                raise ValueError(
                    f"no native stepper for {type(self.env).__name__}"
                )

        self.state = {}
        self._set_state_from(obs0, rewards=None)

    # ------------------------------------------------------------- metadata
    def group_info(self, tag=None):
        return self._group

    def rewards_of(self, state):
        return state[_REWARDS]

    # -------------------------------------------------------------- helpers
    def _stack(self, dicts):
        return np.stack(
            [
                np.stack([np.asarray(d[a]) for a in self._agent_ids])
                for d in dicts
            ]
        ).astype(np.float32)

    def _set_state_from(self, obs_dicts, rewards):
        self.state = {
            _OBS: self._stack(obs_dicts),
            _REWARDS: (
                self._stack(rewards)
                if rewards is not None
                else np.zeros((self.n_envs, self.n_agents), np.float32)
            ),
            _DONE: self._done.copy(),
            _TIMESTEP: self._timestep.copy(),
        }

    # ------------------------------------------------------------- facade
    def reset_all_envs(self) -> np.ndarray:
        self._done[:] = 0
        self._timestep[:] = 0
        if self._native is not None:
            obs = self._native.reset_all(self.envs)
            self.state = {
                _OBS: np.asarray(obs, np.float32),
                _REWARDS: np.zeros((self.n_envs, self.n_agents), np.float32),
                _DONE: self._done.copy(),
                _TIMESTEP: self._timestep.copy(),
            }
            return self.state[_OBS]
        obs = [env.reset() for env in self.envs]
        self._set_state_from(obs, rewards=None)
        return self.state[_OBS]

    reset = reset_all_envs

    def step_all_envs(self, actions) -> dict:
        """actions: (envs, agents[, C]) — returns stacked obs/rew/done."""
        actions = np.asarray(actions)
        if actions.ndim == 2:
            actions = actions[..., None]
        if self._native is not None:
            obs, rew, dones = self._native.step(actions)
            self._done[:] = dones
            self._timestep += 1
            self.state = {
                _OBS: np.asarray(obs, np.float32),
                _REWARDS: np.asarray(rew, np.float32),
                _DONE: self._done.copy(),
                _TIMESTEP: self._timestep.copy(),
            }
            return {
                _OBS: self.state[_OBS],
                _REWARDS: self.state[_REWARDS],
                _DONE: self.state[_DONE],
            }
        obs_l, rew_l = [], []
        for e, env in enumerate(self.envs):
            act_dict = {}
            for i, a in enumerate(self._agent_ids):
                space = self.action_space[a]
                act_dict[a] = (
                    actions[e, i, 0]
                    if isinstance(space, Discrete)
                    else actions[e, i]
                )
            obs, rew, done, _ = env.step(act_dict)
            obs_l.append(obs)
            rew_l.append(rew)
            self._done[e] = (
                int(done["__all__"]) if isinstance(done, dict) else int(done)
            )
        self._timestep += 1
        rew_arr = [
            {a: np.float32(r[a]) for a in self._agent_ids} for r in rew_l
        ]
        self._set_state_from(obs_l, rewards=rew_arr)
        return {
            _OBS: self.state[_OBS],
            _REWARDS: self.state[_REWARDS],
            _DONE: self.state[_DONE],
        }

    def snapshot_runtime_state(self):
        """Deep snapshot of the python env objects + facade state, so
        mid-training evaluation/fetch can run a full episode on the live
        engine and restore it afterwards (the fused engine evaluates on a
        COPY of its state dict; the eager backend must emulate that)."""
        import copy

        return {
            "envs": copy.deepcopy(self.envs),
            "done": self._done.copy(),
            "timestep": self._timestep.copy(),
            "state": {k: np.asarray(v).copy() for k, v in self.state.items()},
            "native": (
                self._native.snapshot() if self._native is not None else None
            ),
        }

    def restore_runtime_state(self, snap):
        self.envs = snap["envs"]
        self.env = self.envs[0]
        self._done = snap["done"].copy()
        self._timestep = snap["timestep"].copy()
        self.state = {k: v.copy() for k, v in snap["state"].items()}
        if self._native is not None and snap.get("native") is not None:
            self._native.restore(snap["native"])
            self._native.env = self.env

    def reset_only_done_envs(self):
        if self._native is not None:
            idx = np.nonzero(self._done)[0]
            if len(idx):
                self._native.reset_rows(idx, self.envs)
                self._done[idx] = 0
                self._timestep[idx] = 0
                self.state[_OBS] = self._native.observe().astype(np.float32)
                self.state[_DONE] = self._done.copy()
                self.state[_TIMESTEP] = self._timestep.copy()
            return
        obs_now = self.state[_OBS].copy()
        for e, env in enumerate(self.envs):
            if self._done[e]:
                obs = env.reset()
                obs_now[e] = np.stack(
                    [np.asarray(obs[a]) for a in self._agent_ids]
                ).astype(np.float32)
                self._done[e] = 0
                self._timestep[e] = 0
        self.state[_OBS] = obs_now
        self.state[_DONE] = self._done.copy()
        self.state[_TIMESTEP] = self._timestep.copy()
