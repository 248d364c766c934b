"""
CPU (pure-python) environment backend.

Parity with the reference's ``EnvWrapper(..., env_backend='cpu')``
(``env_wrapper.py:117-122``): run N independent python env objects behind
the same vectorized facade as :class:`EnvEngine` — useful for debugging an
env's numpy reference implementation at the engine API level without any
compilation (the TPU path's correctness oracle remains
``tools/consistency.py``).
"""

from __future__ import annotations

import numpy as np

from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.env_registrar import env_registrar as default_registrar


class CpuEnvEngine:
    """N python envs behind the EnvEngine facade (reset/step/soft-reset)."""

    def __init__(
        self,
        env_obj=None,
        env_name: str = None,
        env_config: dict = None,
        num_envs: int = 2,
        env_registrar=None,
        seed: int = 0,
    ):
        registrar = env_registrar or default_registrar
        if env_obj is None:
            assert env_name is not None, "pass env_obj or env_name"
            env_cls = registrar.get(env_name, backend="cpu")
            env_obj = None
            self._make_env = lambda: env_cls(**(env_config or {}))
        else:
            env_cls = type(env_obj)
            cfg = env_config or {}
            self._make_env = lambda: env_cls(**cfg)
        self.envs = [self._make_env() for _ in range(num_envs)]
        self.env = self.envs[0]
        self.n_envs = int(num_envs)
        self.n_agents = int(self.env.num_agents)
        self.episode_length = int(self.env.episode_length)
        self._agent_ids = None
        self._done = np.zeros((num_envs,), np.int32)

    def _stack(self, dicts):
        if self._agent_ids is None:
            self._agent_ids = sorted(dicts[0].keys())
        return np.stack(
            [
                np.stack([np.asarray(d[a]) for a in self._agent_ids])
                for d in dicts
            ]
        ).astype(np.float32)

    # ------------------------------------------------------------- facade
    def reset_all_envs(self) -> np.ndarray:
        self._done[:] = 0
        return self._stack([env.reset() for env in self.envs])

    reset = reset_all_envs

    def step_all_envs(self, actions) -> dict:
        """actions: (envs, agents[, C]) — returns stacked obs/rew/done."""
        actions = np.asarray(actions)
        obs_l, rew_l = [], []
        for e, env in enumerate(self.envs):
            act_dict = {
                a: np.squeeze(actions[e, i])
                for i, a in enumerate(
                    self._agent_ids or sorted(range(self.n_agents))
                )
            }
            obs, rew, done, _ = env.step(act_dict)
            obs_l.append(obs)
            rew_l.append(rew)
            self._done[e] = int(done["__all__"]) if isinstance(done, dict) else int(done)
        return {
            Constants.OBSERVATIONS: self._stack(obs_l),
            Constants.REWARDS: self._stack(rew_l),
            Constants.DONE: self._done.copy(),
        }

    def reset_only_done_envs(self):
        for e, env in enumerate(self.envs):
            if self._done[e]:
                env.reset()
                self._done[e] = 0
