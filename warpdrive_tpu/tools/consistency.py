"""
CPU-reference vs TPU consistency checker.

This is the framework's signature correctness oracle, with API parity to the
reference's ``EnvironmentCPUvsGPU``
(``warp_drive/env_cpu_gpu_consistency_checker.py:72-365``): run N independent
numpy reference envs against one vectorized TPU engine for several episodes,
pushing IDENTICAL random actions into both, and assert per-step observations,
rewards and done flags agree within a threshold (1% relative-or-absolute,
cf. reference ``:542-579``), including across done-driven auto-resets.

Because pure-JAX envs also run on CPU, this check needs no accelerator and
runs in CI; it doubles as the race-condition/fusion-correctness oracle the
reference relies on (SURVEY §5).
"""

from __future__ import annotations

import numpy as np

from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.spaces import Box, Discrete, MultiDiscrete

_OBS = Constants.OBSERVATIONS
_REWARDS = Constants.REWARDS


def _assert_all_close(a, b, threshold_pct: float, label: str):
    """abs-or-relative closeness (reference checker ``:542-579``)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, f"{label}: shape {a.shape} != {b.shape}"
    tol = threshold_pct / 100.0
    abs_diff = np.abs(a - b)
    ok = (abs_diff <= tol) | (abs_diff <= tol * np.abs(b))
    if not ok.all():
        idx = np.unravel_index(np.argmax(abs_diff * ~ok), a.shape)
        raise AssertionError(
            f"{label}: mismatch at {idx}: cpu={b[idx]!r} tpu={a[idx]!r} "
            f"(max abs diff {abs_diff.max():.6g})"
        )


class EnvironmentCPUvsTPU:
    """
    Lockstep CPU-reference vs TPU-engine runner.

    :param cpu_env_class: numpy reference env class (gym-style dict API).
    :param tpu_env_class: TPU env class (subclass w/ ``step_fn``).
    :param env_configs: dict scenario-name -> env kwargs.
    :param num_envs: replicas to run (each CPU env is an independent object).
    :param num_episodes: episodes to run; >= 2 exercises auto-reset
        (cf. reference ``:106-109``).
    """

    def __init__(
        self,
        cpu_env_class,
        tpu_env_class,
        env_configs: dict,
        num_envs: int = 3,
        num_episodes: int = 2,
        use_gpu_testing_mode: bool = False,  # accepted for API parity; unused
        **kwargs,
    ):
        self.cpu_env_class = cpu_env_class
        self.tpu_env_class = tpu_env_class
        self.env_configs = env_configs
        self.num_envs = num_envs
        self.num_episodes = num_episodes

    # ------------------------------------------------------------------ run
    def test_env_reset_and_step(self, threshold_pct: float = 1.0, seed: int = 17):
        for scenario, config in self.env_configs.items():
            self._run_scenario(scenario, config, threshold_pct, seed)

    def _run_scenario(self, scenario, config, threshold_pct, seed):
        rng = np.random.RandomState(seed)

        cpu_envs = [self.cpu_env_class(**config) for _ in range(self.num_envs)]
        tpu_env = self.tpu_env_class(**config)
        engine = EnvEngine(env_obj=tpu_env, num_envs=self.num_envs, seed=seed)

        agent_ids = engine._agent_ids
        n_agents = engine.n_agents
        action_space = engine.action_space[agent_ids[0]]

        obs_tpu = engine.reset_all_envs()
        obs_cpu = [e.reset() for e in cpu_envs]
        self._compare_obs(obs_cpu, obs_tpu, agent_ids, threshold_pct,
                          f"{scenario}: obs at reset")

        episode_length = engine.episode_length
        total_steps = self.num_episodes * episode_length

        for t in range(total_steps):
            actions = self._draw_actions(rng, action_space, n_agents)

            # CPU side
            cpu_obs_list, cpu_rew_list, cpu_done_list = [], [], []
            for env_id, env in enumerate(cpu_envs):
                act_dict = {
                    aid: (actions[env_id, i, 0]
                          if actions.shape[-1] == 1
                          and isinstance(action_space, Discrete)
                          else actions[env_id, i])
                    for i, aid in enumerate(agent_ids)
                }
                obs, rew, done, _ = env.step(act_dict)
                cpu_obs_list.append(obs)
                cpu_rew_list.append(rew)
                cpu_done_list.append(bool(done["__all__"]))

            # TPU side
            out = engine.step_all_envs(actions)
            done_tpu = np.asarray(out[Constants.DONE]) > 0

            self._compare_obs(cpu_obs_list, np.asarray(out[_OBS]), agent_ids,
                              threshold_pct, f"{scenario}: obs at t={t}")
            rew_cpu = np.stack(
                [
                    np.array([r[aid] for aid in agent_ids], dtype=np.float32)
                    for r in cpu_rew_list
                ]
            )
            _assert_all_close(
                np.asarray(out[_REWARDS]), rew_cpu, threshold_pct,
                f"{scenario}: rewards at t={t}",
            )
            assert (np.asarray(cpu_done_list) == done_tpu).all(), (
                f"{scenario}: done flags diverge at t={t}: "
                f"cpu={cpu_done_list} tpu={done_tpu.tolist()}"
            )

            # reset finished envs on both sides
            if done_tpu.any():
                if engine.store.pools:
                    # Pool-based resets draw random initial states, so the
                    # two sides diverge after the first reset; lockstep
                    # comparison ends here (pool-reset distributions are
                    # tested separately, cf. reference test_pool_reset.py).
                    return
                engine.reset_only_done_envs()
                # after reset the TPU obs placeholder is restored to the
                # at-reset snapshot; verify against the CPU reset obs
                # (skipped when a reset pool randomizes the initial state)
                obs_after = np.asarray(engine.state[_OBS])
                for env_id, is_done in enumerate(done_tpu):
                    if not is_done:
                        continue
                    cpu_reset_obs = _stack_obs(cpu_envs[env_id].reset(), agent_ids)
                    if not engine.store.pools:
                        _assert_all_close(
                            obs_after[env_id], cpu_reset_obs, threshold_pct,
                            f"{scenario}: obs after reset of env {env_id} at t={t}",
                        )

    # ------------------------------------------------------------- helpers
    def _draw_actions(self, rng, action_space, n_agents) -> np.ndarray:
        """Identical random actions for both sides, (envs, agents, A)."""
        if isinstance(action_space, Discrete):
            return rng.randint(
                action_space.n, size=(self.num_envs, n_agents, 1)
            ).astype(np.int32)
        if isinstance(action_space, MultiDiscrete):
            cols = [
                rng.randint(n, size=(self.num_envs, n_agents, 1))
                for n in action_space.nvec
            ]
            return np.concatenate(cols, axis=-1).astype(np.int32)
        if isinstance(action_space, Box):
            shape = (self.num_envs, n_agents) + action_space.shape
            low = np.where(np.isfinite(action_space.low), action_space.low, -1.0)
            high = np.where(np.isfinite(action_space.high), action_space.high, 1.0)
            return (low + rng.rand(*shape) * (high - low)).astype(np.float32)
        raise NotImplementedError(repr(action_space))

    def _compare_obs(self, cpu_obs_list, obs_tpu, agent_ids, threshold_pct, label):
        cpu = np.stack([_stack_obs(o, agent_ids) for o in cpu_obs_list], axis=0)
        _assert_all_close(obs_tpu, cpu, threshold_pct, label)


def _stack_obs(obs_dict, agent_ids):
    return np.stack([np.asarray(obs_dict[aid]) for aid in agent_ids], axis=0)
