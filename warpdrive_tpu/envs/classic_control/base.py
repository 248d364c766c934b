"""
Single-agent environment base.

Parity with reference ``example_envs/single_agent/base.py:4-40``: single-agent
envs expose the same gym-style per-agent-dict API as the multi-agent ones,
with agent id 0, and support a reset pool of initial states
(``reset_pool_size >= 2`` samples a pool entry on every done-driven reset;
smaller values pin a fixed initial state).
"""

from __future__ import annotations

import numpy as np


class SingleAgentEnv:
    """Base class for single-agent environments."""

    def __init__(
        self,
        episode_length: int = 500,
        env_backend: str = "cpu",
        reset_pool_size: int = 0,
        seed: int = None,
    ):
        self.num_agents = 1
        self.agents = {0: True}
        assert episode_length > 0
        self.episode_length = int(episode_length)
        self.action_space = None
        self.observation_space = None
        self.timestep = None
        self.env_backend = env_backend
        self.reset_pool_size = int(reset_pool_size)
        self.seed = seed
        self.np_random = np.random.RandomState(seed)

    # ------------------------------------------------------------------
    def sync_state(self, arrays: dict):
        """Consistency-checker hook: adopt the engine's post-reset state
        (e.g. the pool row a done-driven reset drew) and return the
        regenerated observation, so the CPU-vs-TPU lockstep comparison can
        CONTINUE across randomized pool resets instead of stopping at the
        first done (reference checker has no pool handling at all)."""
        self.timestep = 0
        self.state = (
            np.asarray(arrays["state"]).reshape(-1).astype(np.float32).copy()
        )
        return self._sync_obs()

    def _sync_obs(self):
        return map_to_single_agent(self.state.copy())


def map_to_single_agent(val):
    return {0: val}


def get_action_for_single_agent(action):
    assert isinstance(action, dict) and len(action) == 1
    return action[0]
