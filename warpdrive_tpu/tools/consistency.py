"""
CPU-reference vs TPU consistency checker.

This is the framework's signature correctness oracle, with API parity to the
reference's ``EnvironmentCPUvsGPU``
(``warp_drive/env_cpu_gpu_consistency_checker.py:72-365``): run N independent
numpy reference envs against one vectorized TPU engine for several episodes,
pushing IDENTICAL random actions into both, and assert per-step observations,
rewards and done flags agree within a threshold (1% relative-or-absolute,
cf. reference ``:542-579``), including across done-driven auto-resets.

Supports every placeholder mode (like the reference checker's
``policy_tag_to_agent_id_map`` / ``create_separate_placeholders_for_each_
policy`` / ``obs_dim_corresponding_to_num_agents`` arguments):

* shared Box observations (the default),
* Dict observations (one ``observations_<key>`` array per key),
* separate per-policy placeholders for heterogeneous obs/action spaces,
* agent-dim-first or agent-dim-last observation layouts.

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
    :param policy_tag_to_agent_id_map / create_separate_placeholders_for_
        each_policy / obs_dim_corresponding_to_num_agents: placeholder-mode
        arguments forwarded to the engine (reference checker ``:72-103``).
        If separate mode is requested without a map and the TPU env class
        offers ``policy_map()``, that is used.
    """

    def __init__(
        self,
        cpu_env_class,
        tpu_env_class,
        env_configs: dict,
        num_envs: int = 3,
        num_episodes: int = 2,
        use_gpu_testing_mode: bool = False,  # accepted for API parity; unused
        policy_tag_to_agent_id_map: dict = None,
        create_separate_placeholders_for_each_policy: bool = False,
        obs_dim_corresponding_to_num_agents: str = "first",
        **kwargs,
    ):
        self.cpu_env_class = cpu_env_class
        self.tpu_env_class = tpu_env_class
        self.env_configs = env_configs
        self.num_envs = num_envs
        self.num_episodes = num_episodes
        self.policy_tag_to_agent_id_map = policy_tag_to_agent_id_map
        self.create_separate_placeholders_for_each_policy = bool(
            create_separate_placeholders_for_each_policy
        )
        self.obs_dim_corresponding_to_num_agents = (
            obs_dim_corresponding_to_num_agents
        )

    # ------------------------------------------------------------------ run
    def test_env_reset_and_step(self, threshold_pct: float = 1.0, seed: int = 17):
        for scenario, config in self.env_configs.items():
            self._run_scenario(scenario, config, threshold_pct, seed)

    def _run_scenario(self, scenario, config, threshold_pct, seed):
        rng = np.random.RandomState(seed)

        cpu_envs = [self.cpu_env_class(**config) for _ in range(self.num_envs)]
        tpu_env = self.tpu_env_class(**config)
        pmap = self.policy_tag_to_agent_id_map
        if pmap is None and self.create_separate_placeholders_for_each_policy:
            assert hasattr(tpu_env, "policy_map"), (
                "separate mode needs policy_tag_to_agent_id_map (or a "
                "policy_map() method on the env)"
            )
            pmap = tpu_env.policy_map()
        engine = EnvEngine(
            env_obj=tpu_env,
            num_envs=self.num_envs,
            seed=seed,
            policy_tag_to_agent_id_map=pmap,
            create_separate_placeholders_for_each_policy=(
                self.create_separate_placeholders_for_each_policy
            ),
            obs_dim_corresponding_to_num_agents=(
                self.obs_dim_corresponding_to_num_agents
            ),
        )

        agent_ids = engine._agent_ids
        n_agents = engine.n_agents

        engine.reset_all_envs()
        obs_cpu = [e.reset() for e in cpu_envs]
        self._compare_all_obs(engine, obs_cpu, threshold_pct,
                              f"{scenario}: obs at reset")

        episode_length = engine.episode_length
        total_steps = self.num_episodes * episode_length

        for t in range(total_steps):
            draws = self._draw_actions_per_agent(rng, engine)

            # CPU side
            cpu_obs_list, cpu_rew_list, cpu_done_list = [], [], []
            for env_id, env in enumerate(cpu_envs):
                act_dict = {}
                for aid in agent_ids:
                    a = draws[aid][env_id]
                    space = engine.action_space[aid]
                    act_dict[aid] = (
                        a[0] if isinstance(space, Discrete) else a
                    )
                obs, rew, done, _ = env.step(act_dict)
                cpu_obs_list.append(obs)
                cpu_rew_list.append(rew)
                cpu_done_list.append(bool(done["__all__"]))

            # TPU side
            engine.step_all_envs(self._pack_actions(draws, engine))
            done_tpu = np.asarray(engine.state[Constants.DONE]) > 0

            self._compare_all_obs(engine, cpu_obs_list, threshold_pct,
                                  f"{scenario}: obs at t={t}")
            rew_tpu = np.asarray(engine.rewards_of(engine.state))
            rew_cpu = np.stack(
                [
                    np.array([r[aid] for aid in agent_ids], dtype=np.float32)
                    for r in cpu_rew_list
                ]
            )
            _assert_all_close(
                rew_tpu, rew_cpu, threshold_pct,
                f"{scenario}: rewards at t={t}",
            )
            assert (np.asarray(cpu_done_list) == done_tpu).all(), (
                f"{scenario}: done flags diverge at t={t}: "
                f"cpu={cpu_done_list} tpu={done_tpu.tolist()}"
            )

            # reset finished envs on both sides
            if done_tpu.any():
                engine.reset_only_done_envs()
                if engine.store.pools:
                    # Pool-based resets draw RANDOM pool rows, so the CPU
                    # side cannot predict them.  Deep verification instead:
                    # (a) every done env's post-reset target array must be
                    # an exact member of the registered pool; (b) the CPU
                    # env is SYNCED to the drawn row via its ``sync_state``
                    # hook and lockstep comparison CONTINUES (the reference
                    # checker has no pool handling and would just diverge).
                    can_sync = all(
                        hasattr(e, "sync_state") for e in cpu_envs
                    )
                    for env_id, is_done in enumerate(done_tpu):
                        if not is_done:
                            continue
                        arrays = {}
                        for target, pool in engine.store.pools.items():
                            val = np.asarray(engine.state[target][env_id])
                            pool_np = np.asarray(pool)
                            member = (
                                np.isclose(pool_np, val[None], atol=1e-5)
                                .reshape(pool_np.shape[0], -1)
                                .all(axis=1)
                            )
                            assert member.any(), (
                                f"{scenario}: env {env_id} post-reset "
                                f"{target!r} is not a row of its reset pool"
                            )
                            arrays[target] = val
                        if can_sync:
                            cpu_envs[env_id].reset()
                            cpu_obs_list[env_id] = cpu_envs[env_id].sync_state(
                                arrays
                            )
                    if not can_sync:
                        # no sync hook on this env family: membership was
                        # verified, lockstep cannot continue
                        return
                    self._compare_all_obs(
                        engine, cpu_obs_list, threshold_pct,
                        f"{scenario}: obs after pool reset at t={t}",
                        only_envs=np.nonzero(done_tpu)[0].tolist(),
                    )
                    continue
                # after reset the TPU obs placeholders are restored to the
                # at-reset snapshot; verify against the CPU reset obs
                cpu_obs_after = []
                for env_id, is_done in enumerate(done_tpu):
                    cpu_obs_after.append(
                        cpu_envs[env_id].reset()
                        if is_done
                        else cpu_obs_list[env_id]
                    )
                self._compare_all_obs(
                    engine, cpu_obs_after, threshold_pct,
                    f"{scenario}: obs after reset at t={t}",
                    only_envs=np.nonzero(done_tpu)[0].tolist(),
                )

    # ------------------------------------------------------------- helpers
    def _draw_actions_per_agent(self, rng, engine) -> dict:
        """Identical random actions for both sides: {agent_id: (envs, C)}.
        Heterogeneous per-agent action spaces are supported (each agent
        draws from its own space, in a fixed agent order)."""
        out = {}
        for aid in engine._agent_ids:
            space = engine.action_space[aid]
            if isinstance(space, Discrete):
                out[aid] = rng.randint(
                    space.n, size=(self.num_envs, 1)
                ).astype(np.int32)
            elif isinstance(space, MultiDiscrete):
                cols = [
                    rng.randint(n, size=(self.num_envs, 1))
                    for n in space.nvec
                ]
                out[aid] = np.concatenate(cols, axis=-1).astype(np.int32)
            elif isinstance(space, Box):
                low = np.where(np.isfinite(space.low), space.low, -1.0)
                high = np.where(np.isfinite(space.high), space.high, 1.0)
                out[aid] = (
                    low + rng.rand(self.num_envs, *space.shape) * (high - low)
                ).astype(np.float32)
            else:
                raise NotImplementedError(repr(space))
        return out

    def _pack_actions(self, draws: dict, engine):
        """Per-agent draws -> engine step input: (envs, agents, C) shared,
        or {policy: (envs, A_p, C)} in separate mode."""
        if engine.separate_placeholders:
            packed = {}
            for tag, ids in engine._policy_ids.items():
                packed[tag] = np.stack(
                    [draws[int(aid)] for aid in ids], axis=1
                )
            return packed
        return np.stack(
            [draws[aid] for aid in engine._agent_ids], axis=1
        )

    def _engine_obs_per_agent(self, engine) -> dict:
        """Host views of the engine's obs placeholders keyed per agent:
        ``{agent_id: (envs, *feat) array | {key: (envs, *feat) array}}``."""

        def agent_first(arr, num_agents):
            if (
                self.obs_dim_corresponding_to_num_agents == "last"
                and num_agents > 1
            ):
                return np.swapaxes(arr, 1, -1) if arr.ndim > 2 else arr
            return arr

        out = {}
        if engine.separate_placeholders:
            groups = [
                (tag, engine._policy_ids[tag]) for tag in engine._policy_ids
            ]
        else:
            groups = [(None, np.asarray(engine._agent_ids))]
        for tag, ids in groups:
            info = engine.group_info(tag)
            suffix = f"_{tag}" if tag is not None else ""
            if info["mode"] == "box":
                arr = agent_first(
                    np.asarray(engine.state[_OBS + suffix]), len(ids)
                )
                for k, aid in enumerate(ids):
                    out[int(aid)] = arr[:, k]
            else:
                arrs = {
                    key: agent_first(
                        np.asarray(engine.state[f"{_OBS}{suffix}_{key}"]),
                        len(ids),
                    )
                    for key in info["keys"]
                }
                for k, aid in enumerate(ids):
                    out[int(aid)] = {key: a[:, k] for key, a in arrs.items()}
        return out

    def _compare_all_obs(self, engine, cpu_obs_list, threshold_pct, label,
                         only_envs=None):
        per_agent = self._engine_obs_per_agent(engine)
        env_ids = (
            list(range(self.num_envs)) if only_envs is None else only_envs
        )
        for aid in engine._agent_ids:
            tpu = per_agent[aid]
            if isinstance(tpu, dict):
                for key, arr in tpu.items():
                    cpu = np.stack(
                        [np.asarray(cpu_obs_list[e][aid][key]) for e in env_ids]
                    )
                    _assert_all_close(
                        arr[env_ids], cpu, threshold_pct,
                        f"{label} (agent {aid}, key {key!r})",
                    )
            else:
                cpu = np.stack(
                    [np.asarray(cpu_obs_list[e][aid]) for e in env_ids]
                )
                _assert_all_close(
                    tpu[env_ids], cpu, threshold_pct, f"{label} (agent {aid})"
                )


def _stack_obs(obs_dict, agent_ids):
    return np.stack([np.asarray(obs_dict[aid]) for aid in agent_ids], axis=0)
