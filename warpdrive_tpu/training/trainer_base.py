"""
TrainerBase: shared training infrastructure.

Parity with reference ``warp_drive/training/trainers/trainer_base.py:69-923``,
re-architected TPU-first.  The reference's hot loop dispatches one CUDA kernel
launch and one torch forward per env step from Python
(``trainer_base.py:383-428``); here the ENTIRE iteration -- policy forward,
action sampling, env stepping, done-driven resets, batch accumulation, loss,
and the optimizer update -- is a single jitted program whose rollout is a
``lax.scan`` over the per-env batch length.  Python touches the device once
per iteration.

Responsibilities kept at parity:

* config merge & validation, per-policy sections (``:129-156``),
* policy -> agent-id partitions and ``policies_to_train`` (``:186-192``),
* batch algebra: ``training_batch_size_per_env = train_batch_size //
  num_envs`` and ``num_iters = num_episodes * episode_length //
  train_batch_size`` (``:213,268-269``),
* seeding incl. process offset (``:248-256``),
* metrics + perf stats + results.json (``:603-640,849-887``),
* episode-state fetching / evaluation (``:689-846``),
* checkpoint save/load with the timestep encoded in the filename
  (``trainer_a2c.py:341-384``).
"""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization

from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.spaces import (
    Box,
    Discrete,
    MultiDiscrete,
    get_flattened_obs_size,
)

_OBS = Constants.OBSERVATIONS
_ACTIONS = Constants.ACTIONS
_REWARDS = Constants.REWARDS
_DONE = Constants.DONE
_TIMESTEP = Constants.TIMESTEP

_METRICS_BUFFER = "metrics"


class Metrics:
    """Pretty-printing of metric dicts (reference ``trainer_base.py:890-907``)."""

    @staticmethod
    def pretty_print(metrics: dict):
        for policy, metric_dict in metrics.items():
            print("=" * 60)
            print(f"Metrics for policy '{policy}'")
            print("=" * 60)
            for key, value in metric_dict.items():
                print(f"{key:50}: {value:10.5f}")
        print("=" * 60, flush=True)


class PerfStats:
    """
    Iteration timing and throughput accounting
    (reference ``trainer_base.py:849-887``).

    The jitted iteration dispatches asynchronously, so single-iteration wall
    times are meaningless mid-stream.  Timing is therefore WINDOW-based: the
    trainer calls ``add_window`` only at sync points (metric logs), passing
    the number of iterations/steps completed since the previous sync and the
    fully-synchronized elapsed wall time — every accumulated second is real
    device time.  Per-phase breakdown (rollout vs update) comes from
    ``TrainerBase.profile_phases``, which compiles a rollout-only program.
    """

    def __init__(self):
        self.iters = 0
        self.steps = 0
        self.total_time = 0.0
        self.training_time = 0.0  # kept for API parity with the reference
        self.phase_breakdown = {}  # filled by profile_phases, if run

    def add_window(self, iters: int, steps: int, elapsed: float):
        self.iters += iters
        self.steps += steps
        self.total_time += elapsed

    def get_perf_stats(self) -> dict:
        if self.iters == 0:
            return {}
        stats = {
            "Mean total time per iter (ms)": 1000.0 * self.total_time / self.iters,
            "Mean steps per sec (total)": self.steps / max(self.total_time, 1e-9),
        }
        for k, v in self.phase_breakdown.items():
            stats[k] = v
        return stats

    def pretty_print(self):
        print("=" * 60)
        print("Speed performance stats")
        print("=" * 60)
        for k, v in self.get_perf_stats().items():
            print(f"{k:50}: {v:10.2f}")
        print("=" * 60, flush=True)


class TrainerBase:
    """Common trainer machinery; algorithm-specific subclasses build the
    jitted iteration function."""

    def __init__(
        self,
        env_wrapper=None,
        config=None,
        policy_tag_to_agent_id_map=None,
        create_separate_placeholders_for_each_policy=False,
        obs_dim_corresponding_to_num_agents="first",
        num_devices=1,
        device_id=0,
        results_dir=None,
        verbose=True,
    ):
        assert env_wrapper is not None and config is not None
        self.cuda_envs = env_wrapper  # keep the reference's attribute name
        self.engine = env_wrapper
        self.config = config
        self.verbose = verbose
        self.device_id = int(device_id)
        self.num_devices = int(num_devices)

        # ---------------- config unpack (reference :129-156) ---------------
        trainer_cfg = config["trainer"]
        self.num_envs = int(trainer_cfg["num_envs"])
        assert self.num_envs == self.engine.n_envs
        self.num_episodes = int(trainer_cfg["num_episodes"])
        self.train_batch_size = int(trainer_cfg["train_batch_size"])
        self.n_step = int(trainer_cfg.get("n_step", 1))
        self.neg_pos_env_ratio = float(trainer_cfg.get("neg_pos_env_ratio", -1))
        self.use_evaluator = bool(trainer_cfg.get("evaluator", False))

        self.episode_length = self.engine.episode_length
        # batch algebra (reference :213,268-269)
        self.training_batch_size_per_env = self.train_batch_size // self.num_envs
        assert self.training_batch_size_per_env > 0, (
            "train_batch_size must be >= num_envs"
        )
        total_timesteps = self.num_episodes * self.episode_length
        self.num_iters = int(total_timesteps // self.train_batch_size)
        if self.num_iters == 0:
            raise ValueError(
                "Not enough episodes to even perform a single training "
                "iteration; increase num_episodes."
            )

        # ---------------- policies (reference :186-192) ---------------------
        self.policies = sorted(config["policy"].keys())
        self.policies_to_train = [
            p for p in self.policies if config["policy"][p].get("to_train", False)
        ]
        if policy_tag_to_agent_id_map is None:
            assert len(self.policies) == 1, (
                "multiple policies need an explicit policy_tag_to_agent_id_map"
            )
            policy_tag_to_agent_id_map = {
                self.policies[0]: list(range(self.engine.n_agents))
            }
        self.policy_tag_to_agent_id_map = {
            tag: np.asarray(sorted(ids), dtype=np.int32)
            for tag, ids in policy_tag_to_agent_id_map.items()
        }
        covered = np.concatenate(list(self.policy_tag_to_agent_id_map.values()))
        assert len(covered) == len(set(covered.tolist())) == self.engine.n_agents, (
            "every agent must map to exactly one policy"
        )
        self.create_separate_placeholders_for_each_policy = (
            create_separate_placeholders_for_each_policy
        )
        assert obs_dim_corresponding_to_num_agents in ("first", "last")
        self.obs_dim_corresponding_to_num_agents = obs_dim_corresponding_to_num_agents
        # placeholder layout is decided at ENGINE construction; the trainer
        # flags must agree with it (reference decides both inside
        # TrainerBase via create_and_push_data_placeholders)
        eng_sep = bool(getattr(self.engine, "separate_placeholders", False))
        if bool(create_separate_placeholders_for_each_policy) != eng_sep:
            raise ValueError(
                "create_separate_placeholders_for_each_policy="
                f"{create_separate_placeholders_for_each_policy} but the "
                f"engine was built with {eng_sep}; pass the same flag (and "
                "the policy_tag_to_agent_id_map) to EnvEngine"
            )
        eng_dim = getattr(
            self.engine, "obs_dim_corresponding_to_num_agents", "first"
        )
        assert eng_dim == obs_dim_corresponding_to_num_agents, (
            f"engine stores obs with agent dim {eng_dim!r} but the trainer "
            f"was asked for {obs_dim_corresponding_to_num_agents!r}"
        )
        # eager backend (CpuEnvEngine over numpy reference envs): no pure
        # env step — trainers run a python per-step rollout instead of the
        # fused jitted scan (reference env_backend='cpu' training)
        self._is_eager = bool(getattr(self.engine, "is_eager", False))

        # per-policy spaces
        self.obs_space = {}
        self.act_space = {}
        for tag, ids in self.policy_tag_to_agent_id_map.items():
            first = int(ids[0])
            self.obs_space[tag] = self.engine.observation_space[first]
            self.act_space[tag] = self.engine.action_space[first]

        # ---------------- seeding (reference :248-256) -----------------------
        seed = trainer_cfg.get("seed")
        # lazy default: an unconditional np.random.randint would consume
        # the GLOBAL numpy RNG even when an explicit seed is configured
        seed = int(np.random.randint(10_000_000) if seed is None else seed)
        if getattr(self.engine, "mesh", None) is None:
            # standalone per-device trainers diversify by rank (reference
            # trainer_base.py:249-256 semantics)
            seed += self.device_id + jax.process_index() * 1000
        elif trainer_cfg.get("seed") is None and jax.process_count() > 1:
            # ONE SPMD program spans all processes — host-side rng keys are
            # replicated program inputs and MUST be identical on every
            # process (GSPMD invariant; see parallel/mesh.py docstring).
            # An explicit configured seed is identical by construction; the
            # LAZY default above is an independent per-process draw, so
            # broadcast process 0's draw to everyone.
            from jax.experimental import multihost_utils

            seed = int(
                multihost_utils.broadcast_one_to_all(np.int32(seed))
            )
        self.seed = seed
        self._rng = jax.random.PRNGKey(seed)

        # ---------------- saving / metrics ----------------------------------
        saving_cfg = config["saving"]
        self.metrics_log_freq = int(saving_cfg.get("metrics_log_freq", 100))
        # dispatch-sync cadence: block on the carry every N iterations
        # even when not logging.  The train loop otherwise queues every
        # iteration asynchronously, and on the tunneled TPU deployment
        # an unbounded in-flight queue degrades per-iteration time ~3.6x
        # (round-5 measurement: 455 ms/iter with 25-iteration sync
        # windows vs 1650 ms/iter with no sync across 500 iterations —
        # /tmp/windows_test vs r5_longrun2b).  One sync per 50
        # iterations costs a single RTT (~25 ms) — negligible.
        self.dispatch_sync_freq = int(
            config.get("trainer", {}).get("dispatch_sync_freq", 50)
        )
        self.model_params_save_freq = int(
            saving_cfg.get("model_params_save_freq", 1000)
        )
        if results_dir is None:
            results_dir = os.path.join(
                saving_cfg.get("basedir", "/tmp"),
                saving_cfg.get("name", "default"),
                saving_cfg.get("tag", "experiment"),
                str(int(time.time())),
            )
        self.save_dir = results_dir
        if self._is_lead_process():
            os.makedirs(self.save_dir, exist_ok=True)
            with open(
                os.path.join(self.save_dir, "run_config.json"), "w", encoding="utf-8"
            ) as f:
                json.dump(config, f, indent=2, default=str)

        self.perf_stats = PerfStats()
        self.metrics = Metrics()
        self.current_timestep = 0
        self.iters_completed = 0

        # subclasses populate these
        self.models = {}
        self.params = {}
        self.opt_states = {}
        self._iteration_fn = None  # jitted (carry, timestep) -> (carry, metrics)
        # optional metrics-free twin for hot iterations (keeping loss/metric
        # values as program outputs blocks XLA's forward-into-backward
        # fusion — 2.25x slower measured); train() uses it off log points
        self._iteration_fn_fast = None
        self._carry = None
        self._eval_fns = {}  # use_argmax -> jitted evaluation program
        self._fetch_fns = {}  # (signature) -> jitted episode-fetch program

        logging.info(
            "TrainerBase: %d envs x %d agents, batch/env=%d, iters=%d, seed=%d",
            self.num_envs,
            self.engine.n_agents,
            self.training_batch_size_per_env,
            self.num_iters,
            seed,
        )

    # ------------------------------------------------------------ utilities
    def _rollout_env_state(self):
        """The env-state pytree carried through the rollout scan: on the
        split-step fast path, derived/placeholder arrays (observations,
        sampled actions) stay OUT of the carry — obs are recomputed on the
        fly and fused into the policy forward."""
        state = dict(self.engine.state)
        if self.engine.has_split_step:
            state.pop(Constants.OBSERVATIONS, None)
            state.pop(Constants.ACTIONS, None)
        return state

    def _maybe_shard_carry(self, carry):
        """
        If the engine carries a device mesh (multi-chip run), place the carry
        on it: env-batched leaves sharded over the ``env`` axis, params and
        optimizer state replicated.  XLA then compiles the iteration as one
        SPMD program with an automatic gradient all-reduce — the TPU-native
        replacement for torch DDP (reference ``trainer_a2c.py:137-146``).
        """
        mesh = getattr(self.engine, "mesh", None)
        if mesh is None:
            return carry
        from warpdrive_tpu.parallel.mesh import shard_carry

        return shard_carry(carry, mesh, self.num_envs)

    def _is_lead_process(self) -> bool:
        return self.device_id == 0 and jax.process_index() == 0

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _gather_policy_mask(self, env_state, tag):
        """Per-policy slice of a shared ``action_mask`` state array, if the
        env exposes one (1 keep / 0 forbid, concatenated over action
        components — reference ``model_base.py:203-213``)."""
        mask = env_state.get(Constants.ACTION_MASK)
        if mask is None:
            return None
        ids = jnp.asarray(self.policy_tag_to_agent_id_map[tag])
        return jnp.take(mask, ids, axis=1).astype(jnp.float32)

    def _reshape_flatten(self, arr: jnp.ndarray, num_agents: int) -> jnp.ndarray:
        """(E, A, *feat) — or agent-dim-LAST (E, *feat, A) when
        ``obs_dim_corresponding_to_num_agents == "last"`` — to (E, A, flat)
        (reference ``model_base.py:105-131``)."""
        E = arr.shape[0]
        if self.obs_dim_corresponding_to_num_agents == "last":
            if arr.ndim <= 2:
                arr = arr.reshape(E, num_agents, -1)
            else:
                arr = jnp.moveaxis(arr, -1, 1)
        return arr.reshape(E, num_agents, -1)

    def _policy_obs_and_mask(self, env_state, obs_all, tag):
        """
        One policy's flattened observations + action mask, across all
        placeholder modes (reference ``model_base.py:133-186``):

        * shared Box: gather the policy's agents from ``observations``
          (``obs_all`` overrides the placeholder on the split-step fast
          path);
        * shared Dict: flatten + concat every ``observations_<key>`` on the
          feature axis; an ``action_mask`` key becomes the logit mask;
        * separate mode: same, from ``observations_<tag>[_<key>]`` with no
          agent gather (the arrays already hold only this policy's agents).

        Returns ``(obs (E, A_p, F), mask (E, A_p, M) or None)``.
        """
        eng = self.engine
        ids = self.policy_tag_to_agent_id_map[tag]
        Ap = len(ids)
        mask = None
        group = (
            eng.group_info(tag)
            if hasattr(eng, "group_info")
            else {"mode": "box", "keys": []}
        )
        if getattr(eng, "separate_placeholders", False):
            if group["mode"] == "dict":
                parts = []
                for key in group["keys"]:
                    flat = self._reshape_flatten(
                        env_state[f"{_OBS}_{tag}_{key}"], Ap
                    )
                    if key == Constants.ACTION_MASK:
                        mask = flat
                    else:
                        parts.append(flat)
                obs = (
                    parts[0]
                    if len(parts) == 1
                    else jnp.concatenate(parts, axis=-1)
                )
            else:
                obs = self._reshape_flatten(env_state[f"{_OBS}_{tag}"], Ap)
        else:
            # gather fast paths (round-4 gridworld trace: vmapped
            # per-step gathers run at ~17-76 GB/s on TPU): a policy
            # owning ALL agents needs no gather at all, and a policy
            # whose agent ids are one contiguous run is a static slice
            # NOTE: the contiguous-run fast path below assumes ids are
            # sorted ascending; unsorted ids correctly (if less
            # efficiently) fall through to the one-hot contraction,
            # which preserves the id order
            ids_arr = np.asarray(ids)
            if len(ids_arr) == eng.n_agents and np.array_equal(
                ids_arr, np.arange(eng.n_agents)
            ):
                take = lambda x: x
            elif len(ids_arr) > 0 and np.array_equal(
                ids_arr,
                np.arange(ids_arr[0], ids_arr[0] + len(ids_arr)),
            ):
                lo, hi = int(ids_arr[0]), int(ids_arr[0]) + len(ids_arr)
                take = lambda x: x[:, lo:hi]
            else:
                # interleaved ids (e.g. the flagship's random tagger
                # placement): contract against a constant one-hot
                # selection matrix instead of gathering — rides the
                # MXU/VPU instead of the serial gather unit
                sel_np = np.zeros(
                    (len(ids_arr), eng.n_agents), np.float32
                )
                sel_np[np.arange(len(ids_arr)), ids_arr] = 1.0
                sel_const = jnp.asarray(sel_np)

                def take(x, _sel=sel_const, _ids=ids):
                    if x.ndim == 3:
                        return jnp.einsum(
                            "pn,enf->epf", _sel.astype(x.dtype), x
                        )
                    return jnp.take(x, jnp.asarray(_ids), axis=1)
            if group["mode"] == "dict":
                parts = []
                for key in group["keys"]:
                    flat = self._reshape_flatten(
                        env_state[f"{_OBS}_{key}"], eng.n_agents
                    )
                    if key == Constants.ACTION_MASK:
                        mask = take(flat)
                    else:
                        parts.append(flat)
                obs = take(
                    parts[0]
                    if len(parts) == 1
                    else jnp.concatenate(parts, axis=-1)
                )
            else:
                source = obs_all if obs_all is not None else env_state[_OBS]
                obs = take(self._reshape_flatten(source, eng.n_agents))
        if mask is None:
            mask = self._gather_policy_mask(env_state, tag)
        return obs, mask

    def _action_heads(self, tag: str):
        """Per-component head sizes + dtype for a policy's action space."""
        space = self.act_space[tag]
        if isinstance(space, Discrete):
            return [space.n], np.int32, False
        if isinstance(space, MultiDiscrete):
            return [int(n) for n in space.nvec], np.int32, False
        if isinstance(space, Box):
            return [1] * int(space.shape[0]), np.float32, True
        raise NotImplementedError(repr(space))

    # ------------------------------------------------------------- training
    def train(self):
        """
        Main loop (reference ``trainer_base.py:357-381``): ``num_iters``
        jitted iterations, metrics every ``metrics_log_freq``, checkpoints
        every ``model_params_save_freq``.
        """
        assert self._iteration_fn is not None or self._is_eager, (
            "subclass must build the program"
        )
        steps_per_iter = self.training_batch_size_per_env * self.num_envs

        if self.use_evaluator and not self._is_eager:
            # compile (and warm) the evaluator program BEFORE any training
            # work: its first call otherwise lands at a log point AFTER
            # training has run — a trailing mid-run compile, which on TPU
            # can wedge the process after the work but before the final
            # checkpoint (CLAUDE.md rule 6). Results are discarded.
            self.evaluate_episodes(use_argmax=True)

        window_start = time.time()
        window_iters = 0
        first_iteration = self.iters_completed
        for iteration in range(self.iters_completed, self.num_iters):
            log_now = (
                (iteration + 1) % self.metrics_log_freq == 0
                or iteration == self.num_iters - 1
            )
            if self._is_eager:
                metrics = self._eager_iteration(self.current_timestep)
            else:
                # hot iterations run the metrics-free program (keeping
                # loss/metric values as outputs blocks XLA's forward-into-
                # backward fusion: 2.25x slower measured on v5e); the
                # full-metrics program runs only at log points.  The FULL
                # program always runs (and therefore compiles) on the
                # first iteration so that with a sparse log cadence its
                # compile cannot become a trailing mid-run compile — on
                # TPU a failed remote compile after the training work
                # would risk losing the final checkpoint (CLAUDE.md
                # rule 6: save results before any optional compile).
                fn = self._iteration_fn
                if (
                    not log_now
                    and iteration != first_iteration
                    and self._iteration_fn_fast is not None
                ):
                    fn = self._iteration_fn_fast
                self._carry, metrics = fn(
                    self._carry,
                    jnp.asarray(self.current_timestep, dtype=jnp.float32),
                )
            self.current_timestep += steps_per_iter
            self.iters_completed += 1
            window_iters += 1
            # keep the engine facade pointing at live (non-donated) buffers;
            # merge because the fast-path carry omits derived arrays (obs),
            # which the facade's next force-reset restores from snapshot
            if isinstance(self._carry, dict) and "env_state" in self._carry:
                self.engine.state = {
                    **self.engine.state,
                    **self._carry["env_state"],
                }

            if (
                not log_now
                and self.dispatch_sync_freq > 0
                and (iteration + 1) % self.dispatch_sync_freq == 0
                and self._carry is not None
            ):
                # keep the async dispatch queue shallow (see
                # dispatch_sync_freq in __init__)
                jax.block_until_ready(
                    jax.tree_util.tree_leaves(self._carry)[0]
                )

            if log_now:
                # force completion of everything dispatched this window so
                # the elapsed time is fully synchronized device time
                from warpdrive_tpu.parallel.mesh import to_host

                metrics_host = jax.tree_util.tree_map(
                    lambda x: float(to_host(x)), metrics
                )
                if self._carry is not None:
                    jax.block_until_ready(
                        jax.tree_util.tree_leaves(self._carry)[0]
                    )
                self.perf_stats.add_window(
                    window_iters,
                    window_iters * steps_per_iter,
                    time.time() - window_start,
                )
                if self.use_evaluator:
                    # test-time evaluator: action randomness removed
                    # (reference ``trainer_a2c.py:326-339``)
                    eval_rew, eval_steps = self.evaluate_episodes(
                        use_argmax=True
                    )
                    for tag in metrics_host:
                        metrics_host[tag]["Mean episodic reward (test)"] = (
                            float(eval_rew[tag].mean())
                        )
                        metrics_host[tag]["Mean episodic steps (test)"] = (
                            float(eval_steps[tag].mean())
                        )
                self._log_metrics(metrics_host)
                if self.verbose and self._is_lead_process():
                    print(
                        f"Iteration {iteration + 1}/{self.num_iters} | "
                        f"timestep {self.current_timestep:,}"
                    )
                    self.metrics.pretty_print(metrics_host)
                    self.perf_stats.pretty_print()

            if (iteration + 1) % self.model_params_save_freq == 0:
                self.save_model_checkpoint(self.current_timestep)

            if log_now or (iteration + 1) % self.model_params_save_freq == 0:
                # evaluation/logging/checkpoint overhead stays OUT of the
                # next timing window; a checkpoint without a log discards
                # its window (un-synced timing would be unreliable)
                window_start = time.time()
                window_iters = 0

        # final checkpoint + sync (reference :374-381)
        if self._carry is not None:
            jax.block_until_ready(jax.tree_util.tree_leaves(self._carry)[0])
        self.save_model_checkpoint(self.current_timestep)
        self.graceful_close()

    def _log_metrics(self, metrics: dict):
        """Append metrics to results.json (reference ``:603-640``)."""
        if not self._is_lead_process():
            return
        record = {
            "iterations completed": self.iters_completed,
            "num timesteps": self.current_timestep,
            "metrics": metrics,
            "speed performance stats": self.perf_stats.get_perf_stats(),
        }
        results_path = os.path.join(self.save_dir, "results.json")
        with open(results_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")

    # --------------------------------------------------------- checkpoints
    def _ckpt_path(self, policy: str, timestep: int, net: str = "") -> str:
        suffix = f"_{net}" if net else ""
        return os.path.join(
            self.save_dir, f"{policy}{suffix}_{timestep}.state_dict"
        )

    def _current_params(self, policy: str):
        """Latest params: from the live carry once training started (the
        initial ``self.params`` buffers are donated to the jitted program)."""
        if self._carry is not None and "params" in self._carry:
            return self._carry["params"][policy]
        return self.params[policy]

    def save_model_checkpoint(self, timestep: int = None):
        """Serialize per-policy params (reference ``trainer_a2c.py:361-384``).

        Multi-process rule: the host pull (``to_host``) may be a
        CROSS-PROCESS collective (param leaves whose output sharding GSPMD
        chose to split), so EVERY process must execute it; only the file
        write is lead-only.  A lead-gated collective deadlocks the cluster
        (observed: non-lead finished train() while the lead blocked in
        ``process_allgather`` at the final checkpoint).
        """
        timestep = self.current_timestep if timestep is None else timestep
        from warpdrive_tpu.parallel.mesh import to_host

        for policy in self.policies_to_train:
            params_host = jax.tree_util.tree_map(
                to_host, self._current_params(policy)
            )
            if not self._is_lead_process():
                continue
            payload = serialization.to_bytes(params_host)
            with open(self._ckpt_path(policy, timestep), "wb") as f:
                f.write(payload)

    # ---- full train-state checkpointing (beyond reference parity: the
    # reference saves model params only, trainer_a2c.py:361-384; SURVEY §5
    # flags full-pytree checkpointing as the TPU-build upgrade) -----------
    def save_full_state(self, path: str = None) -> str:
        """
        Serialize the ENTIRE training state — model params, optimizer
        moments, env state, episodic accounting, and the RNG — so a run can
        resume exactly where it stopped (the reference cannot: it
        checkpoints params only and loses optimizer/env state).
        """
        assert self._carry is not None, (
            "full-state checkpointing requires the fused trainer (not the "
            "eager CPU backend)"
        )
        path = path or os.path.join(
            self.save_dir, f"full_state_{self.current_timestep}.ckpt"
        )
        payload = {
            "carry": jax.device_get(self._carry),
            "rng": jax.device_get(self._rng),
            "current_timestep": self.current_timestep,
            "iters_completed": self.iters_completed,
        }
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))
        return path

    def load_full_state(self, path: str):
        """Restore a :meth:`save_full_state` checkpoint and resume."""
        assert self._carry is not None
        template = {
            "carry": jax.device_get(self._carry),
            "rng": jax.device_get(self._rng),
            "current_timestep": 0,
            "iters_completed": 0,
        }
        with open(path, "rb") as f:
            payload = serialization.from_bytes(template, f.read())
        self._carry = self._maybe_shard_carry(payload["carry"])
        self._rng = jnp.asarray(payload["rng"])
        self.current_timestep = int(payload["current_timestep"])
        self.iters_completed = int(payload["iters_completed"])

    def load_model_checkpoint(self, ckpt_filepaths: dict):
        """
        Restore per-policy params from files whose names encode the saved
        timestep, and resume schedules from it
        (reference ``trainer_a2c.py:341-359``).
        """
        timesteps = set()
        loaded = []
        for policy, path in ckpt_filepaths.items():
            if not isinstance(path, str):
                raise TypeError(
                    f"expected a checkpoint file path per policy, got "
                    f"{type(path).__name__} for {policy!r} (DDPG takes "
                    "{'policy': {'actor': path, 'critic': path}})"
                )
            if not path:
                continue
            with open(path, "rb") as f:
                payload = f.read()
            self.params[policy] = serialization.from_bytes(
                jax.device_get(self._current_params(policy)), payload
            )
            loaded.append(policy)
            fname = os.path.basename(path)
            stem = fname.split(".")[0]
            timesteps.add(int(stem.split("_")[-1]))
        if timesteps:
            assert len(timesteps) == 1, "checkpoints disagree on the timestep"
            self.current_timestep = timesteps.pop()
        self._rebuild_carry_params(loaded)

    def _rebuild_carry_params(self, loaded=None):  # pragma: no cover
        raise NotImplementedError

    _action_dtype = None  # subclass: jnp.int32 (discrete) / float32 (DDPG)

    def _scatter_actions(self, per_policy_actions: dict) -> jnp.ndarray:
        """Merge per-policy action blocks into the (E, N, C) placeholder."""
        num_c = max(a.shape[-1] for a in per_policy_actions.values())
        actions = jnp.zeros(
            (self.num_envs, self.engine.n_agents, num_c),
            dtype=self._action_dtype,
        )
        for tag, acts in per_policy_actions.items():
            ids = jnp.asarray(self.policy_tag_to_agent_id_map[tag])
            actions = actions.at[:, ids, : acts.shape[-1]].set(acts)
        return actions

    def _act_params(self):
        """Params pytree consumed by ``self._act_fn`` (subclass detail)."""
        if self._carry is not None and "params" in self._carry:
            return self._carry["params"]
        if self._carry is not None and "actor" in self._carry:
            return self._carry["actor"]
        return self.params

    # ------------------------------------------------------------ evaluation
    def _build_eval_fn(self, use_argmax: bool):
        """One jitted program: a full evaluation episode over all replicas."""
        engine = self.engine
        E, N = self.num_envs, self.engine.n_agents

        def run(params, state0, keys):
            def body(carry, key_t):
                st, alive, rew_sum, step_sum = carry
                actions = self._act_fn(params, st, key_t, use_argmax=use_argmax)
                st = engine.step(st, actions)
                # Sticky per-env mask: an env stops accumulating the moment
                # its done flag fires and never resumes.  This reproduces
                # reference ``trainer_base.py:794-846``, which accumulates
                # only where ``_done_ == 0`` (checked after the step) and
                # soft-resets finished envs WITHOUT undoing done.
                alive = alive & (st[Constants.DONE] == 0)
                af = alive.astype(jnp.float32)
                rew_sum = rew_sum + engine.rewards_of(st) * af[:, None]
                step_sum = step_sum + alive.astype(jnp.int32)
                return (st, alive, rew_sum, step_sum), None

            init = (
                state0,
                jnp.ones((E,), dtype=bool),
                jnp.zeros((E, N), jnp.float32),
                jnp.zeros((E,), jnp.int32),
            )
            (_, _, rew_sum, step_sum), _ = jax.lax.scan(body, init, keys)
            return rew_sum, step_sum

        return jax.jit(run)

    def evaluate_episodes(self, use_argmax: bool = True):
        """
        Deterministic-policy evaluation over all env replicas for one
        episode (reference ``trainer_base.py:794-846``): argmax actions (or
        noise-free continuous actions), rewards and steps accumulated per
        env only while its done flag is still 0.

        Returns ``(episodic_reward_sum, episodic_step_sum)`` — per-policy
        numpy arrays of shape ``(num_envs, num_agents_for_policy)`` and
        ``(num_envs,)``, exactly like the reference.
        """
        if self._is_eager:
            return self._evaluate_episodes_eager(use_argmax)
        mode = bool(use_argmax)
        if mode not in self._eval_fns:
            self._eval_fns[mode] = self._build_eval_fn(mode)
        self.engine.reset_all_envs()
        state0 = dict(self.engine.state)
        keys = jax.random.split(self._next_rng(), self.engine.episode_length)
        rew_sum, step_sum = self._eval_fns[mode](
            self._act_params(), state0, keys
        )
        from warpdrive_tpu.parallel.mesh import to_host

        rew_sum = to_host(rew_sum)
        step_sum = to_host(step_sum)
        episodic_reward_sum = {}
        episodic_step_sum = {}
        for tag, ids in self.policy_tag_to_agent_id_map.items():
            episodic_reward_sum[tag] = rew_sum[:, ids]
            episodic_step_sum[tag] = step_sum.copy()
        return episodic_reward_sum, episodic_step_sum

    def _evaluate_episodes_eager(self, use_argmax: bool = True):
        """Done-masked evaluation against the eager CPU backend: same
        semantics as the jitted path, python-stepped.  The live engine is
        snapshotted and restored so a mid-training evaluation cannot
        corrupt the training rollout state (the fused path evaluates on a
        copied state dict and has no such hazard)."""
        engine = self.engine
        params = self._act_params()
        E, N = self.num_envs, engine.n_agents
        runtime_snap = engine.snapshot_runtime_state()
        engine.reset_all_envs()
        alive = np.ones((E,), dtype=bool)
        rew_sum = np.zeros((E, N), np.float32)
        step_sum = np.zeros((E,), np.int32)
        for _ in range(engine.episode_length):
            actions = self._act_fn(
                params, engine.state, self._next_rng(), use_argmax=use_argmax
            )
            out = engine.step_all_envs(np.asarray(actions))
            alive = alive & (np.asarray(out[Constants.DONE]) == 0)
            rew_sum += np.asarray(out[Constants.REWARDS]) * alive[:, None]
            step_sum += alive.astype(np.int32)
            if not alive.any():
                break
        engine.restore_runtime_state(runtime_snap)
        episodic_reward_sum = {}
        episodic_step_sum = {}
        for tag, ids in self.policy_tag_to_agent_id_map.items():
            episodic_reward_sum[tag] = rew_sum[:, ids]
            episodic_step_sum[tag] = step_sum.copy()
        return episodic_reward_sum, episodic_step_sum

    def fetch_episode_states(
        self,
        list_of_states: list,
        env_id: int = 0,
        include_rewards_actions: bool = False,
        include_probabilities: bool = False,
    ):
        """
        Step one episode with the current policy, recording the requested
        state arrays of env ``env_id`` per timestep
        (reference ``trainer_base.py:689-792``).  Subclasses with
        probability heads override to add ``include_probabilities``.
        """
        assert isinstance(list_of_states, list) and len(list_of_states) > 0
        assert not include_probabilities, (
            "include_probabilities is only available on trainers with "
            "categorical policies (TrainerA2C)"
        )
        if self._is_eager:
            return self._fetch_episode_states_eager(
                list_of_states, env_id, include_rewards_actions
            )
        engine = self.engine
        for name in list_of_states:
            assert name in engine.state, f"{name!r} is not a state array"
        params = self._act_params()
        T = engine.episode_length

        # cache the jitted episode program per argument signature — a fresh
        # jit per call would recompile the full T-step scan every time the
        # user fetches another episode (and each compile is a mid-run
        # remote-compile exposure on TPU)
        cache_key = (
            "fetch",
            tuple(list_of_states),
            int(env_id),
            bool(include_rewards_actions),
        )
        if cache_key not in self._fetch_fns:

            def scan_fn(params, state0, keys):
                def body(carry, key_t):
                    st, t = carry
                    actions = self._act_fn(params, st, key_t)
                    st = engine.step(st, actions)
                    rec = {
                        name: st[name][env_id] for name in list_of_states
                    }
                    if include_rewards_actions:
                        rec["_rewards"] = engine.rewards_of(st)[env_id]
                        # separate mode: merge the per-policy action dict
                        a_rec = (
                            self._scatter_actions(actions)
                            if isinstance(actions, dict)
                            else actions
                        )
                        rec["_actions"] = a_rec[env_id]
                    rec["_done"] = st[Constants.DONE][env_id]
                    return (st, t + 1), rec

                return jax.lax.scan(body, (state0, 0), keys)

            self._fetch_fns[cache_key] = jax.jit(scan_fn)

        self.engine.reset_all_envs()
        state0 = dict(self.engine.state)
        first = {
            name: np.asarray(state0[name][env_id]) for name in list_of_states
        }
        keys = jax.random.split(self._next_rng(), T)
        (_, _), recs = self._fetch_fns[cache_key](params, state0, keys)

        done_t = np.asarray(recs["_done"])
        end = int(np.argmax(done_t > 0)) + 1 if (done_t > 0).any() else T
        out = {}
        for name in list_of_states:
            out[name] = np.concatenate(
                [first[name][None], np.asarray(recs[name])[:end]], axis=0
            )
        if include_rewards_actions:
            out["rewards"] = np.asarray(recs["_rewards"])[:end]
            out["actions"] = np.asarray(recs["_actions"])[:end]
        return out

    def _fetch_episode_states_eager(
        self, list_of_states, env_id, include_rewards_actions
    ):
        """Python-stepped episode replay for the eager CPU backend; the
        live engine is snapshotted/restored (see eval above)."""
        engine = self.engine
        for name in list_of_states:
            assert name in engine.state, f"{name!r} is not a state array"
        params = self._act_params()
        runtime_snap = engine.snapshot_runtime_state()
        engine.reset_all_envs()
        recs = {name: [np.asarray(engine.state[name][env_id])]
                for name in list_of_states}
        rewards, actions_l = [], []
        for _ in range(engine.episode_length):
            actions = self._act_fn(
                params, engine.state, self._next_rng(), use_argmax=False
            )
            if isinstance(actions, dict):
                actions = self._scatter_actions(actions)
            actions = np.asarray(actions)
            out = engine.step_all_envs(actions)
            for name in list_of_states:
                recs[name].append(np.asarray(engine.state[name][env_id]))
            if include_rewards_actions:
                rewards.append(np.asarray(out[Constants.REWARDS][env_id]))
                actions_l.append(actions[env_id])
            if np.asarray(out[Constants.DONE][env_id]) > 0:
                break
        engine.restore_runtime_state(runtime_snap)
        result = {name: np.stack(v) for name, v in recs.items()}
        if include_rewards_actions:
            result["rewards"] = np.stack(rewards)
            result["actions"] = np.stack(actions_l)
        return result

    def _build_rollout_profile_fn(self):  # pragma: no cover - subclass detail
        raise NotImplementedError

    def _build_update_profile_fn(self):  # pragma: no cover - subclass detail
        """``(carry, batch, timestep, key) -> new_carry`` running ONLY the
        model update on a pre-materialized rollout batch — the direct
        update-phase timer for :meth:`profile_phases`.  Subclasses without
        a separable update return ``None`` (falls back to the residual
        ``iteration - rollout`` estimate)."""
        return None

    def fetch_logged_episode(self, env_id: int = 0):
        """
        Dense per-timestep trajectories of every state array the env flagged
        ``log_data_across_episode``, for one env replica, recorded ON DEVICE
        by the :class:`EpisodeLogger` inside a single jitted episode scan —
        the TPU-native replacement for the reference's ``CUDALogController``
        (``managers/function_manager.py:295-422``: ``reset_log`` + one
        ``log_one_step_in_*`` kernel launch per step).

        Returns ``{name: (last_step + 1, *feat) numpy array}`` truncated at
        the env's done step, with the log-mask contiguity check applied
        (reference ``log.cu:20-29``).
        """
        from warpdrive_tpu.core.episode_log import EpisodeLogger

        if self._is_eager:
            raise NotImplementedError(
                "fetch_logged_episode needs the device-side episode logger; "
                "on the eager CPU backend use fetch_episode_states instead"
            )
        engine = self.engine
        logger = EpisodeLogger(engine.store)
        assert logger.log_names, (
            "no state array was pushed with log_data_across_episode=True "
            "(reference DataFeed.add_data flag)"
        )
        params = self._act_params()
        T = engine.episode_length

        def run(params, state0, buffers0, keys):
            def body(carry, key_t):
                st, bufs, t, done_seen = carry
                actions = self._act_fn(params, st, key_t, use_argmax=True)
                st = engine.step(st, actions)
                # log up to AND INCLUDING the terminal step, then stop —
                # keeps the log mask contiguous (reference ``log.cu:20-29``)
                logged = logger.log_step(bufs, st, t, env_id)
                bufs = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(done_seen, old, new),
                    logged,
                    bufs,
                )
                done_seen = done_seen | (st[Constants.DONE][env_id] > 0)
                return (st, bufs, t + 1, done_seen), st[Constants.DONE][env_id]

            (st, bufs, _, _), done_t = jax.lax.scan(
                body, (state0, buffers0, 1, jnp.asarray(False)), keys
            )
            return bufs, done_t

        self.engine.reset_all_envs()
        state0 = dict(self.engine.state)
        buffers0 = logger.init_buffers(state0, env_id)
        keys = jax.random.split(self._next_rng(), T)
        log_key = ("logged", int(env_id))
        if log_key not in self._fetch_fns:
            self._fetch_fns[log_key] = jax.jit(run)
        buffers, done_t = self._fetch_fns[log_key](
            params, state0, buffers0, keys
        )

        done_t = np.asarray(done_t)
        last_step = int(np.argmax(done_t > 0)) + 1 if (done_t > 0).any() else T
        return logger.fetch(buffers, last_step)

    def profile_phases(self, repeats: int = 3) -> dict:
        """
        Per-phase timing breakdown.  The reference times policy eval /
        action sample / env step separately with cuda events
        (``trainer_base.py:383-428``); the fused design compiles TWO
        programs — the full iteration and the rollout scan alone (the same
        code path, via ``_make_rollout``) — and attributes the difference
        to the model update.

        Returns ms-per-iteration measurements ``{"iteration_ms",
        "rollout_ms", "update_ms", "update_ms_residual", "steps_per_sec",
        "rollout_steps_per_sec"}`` and records them on ``self.perf_stats``
        so subsequent logs include the breakdown.

        Phase-attribution semantics: ``update_ms`` is the DIRECTLY timed
        standalone update program (an upper bound — it includes the
        per-program dispatch floor, measured ~25 ms through the tunneled
        deployment, artifacts/round4/verify_profile_phases.json);
        ``update_ms_residual = max(iteration - rollout, 0)`` is a lower
        bound (run-to-run variance can collapse it to 0 for small
        updates).  The true fused update cost lies between the two; for
        bench-scale programs (hundreds of ms) the bracket is tight.
        """
        assert self._iteration_fn is not None and self._carry is not None
        steps_per_iter = self.training_batch_size_per_env * self.num_envs

        # Every repeat must be a UNIQUE (program, inputs) execution: some
        # TPU runtimes memoize repeated identical executions (observed on
        # the tunneled deployment here: after ~16 identical calls the
        # "computation" returns in ~0.1 ms with cached results), which
        # silently turns a replay-style timing loop into a cache benchmark.
        # The iteration is timed by CHAINING its output carry into the next
        # repeat (what train() actually does); the rollout by drawing a
        # fresh rng per repeat.  Best-of-repeats: robust to load spikes.
        # Every repeat ends with a one-element VALUE FETCH, not just
        # block_until_ready: the tunneled deployment can report a buffer
        # "ready" while deferring its realization (round-4 discovery,
        # ROUND4_NOTES.md — an update variant "measured" 0.5 ms under
        # block_until_ready and 200+ ms under a fetch).  The fetch adds
        # one tiny d2h round-trip (~sub-ms), negligible at bench scale.
        def _fetch(tree):
            np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

        def timeit(fn, first_args, next_args):
            out = fn(*first_args)  # compile + warm up
            _fetch(out)
            times = []
            for _ in range(repeats):
                args = next_args(out)
                t0 = time.time()
                out = fn(*args)
                _fetch(out)
                times.append((time.time() - t0) * 1000)
            return min(times), times

        # no donation: the timing loop reuses the same carry buffers.
        # Time the HOT program (metrics-free where the subclass provides
        # one) — that is what every non-log training iteration runs.
        carry = jax.tree_util.tree_map(jnp.copy, self._carry)
        t_arg = jnp.asarray(0.0, jnp.float32)
        iter_ms, iter_ms_repeats = timeit(
            jax.jit(self._build_hot_iteration_fn()),
            (carry, t_arg),
            lambda out: (out[0], t_arg),  # chain the returned carry
        )
        rollout_fn = jax.jit(self._build_rollout_profile_fn())
        rollout_ms, rollout_ms_repeats = timeit(
            rollout_fn,
            (carry, self._next_rng()),
            lambda out: (carry, self._next_rng()),  # fresh key per repeat
        )
        # DIRECT update timing: an update-only program on a real rollout
        # batch.  The old residual estimate max(iter - rollout, 0)
        # collapses to 0 whenever run-to-run variance exceeds the update
        # cost (a structurally wrong published number for small updates);
        # it is kept only as `update_ms_residual` and as the fallback for
        # trainers without a separable update.
        update_ms_residual = max(iter_ms - rollout_ms, 0.0)
        update_fn = self._build_update_profile_fn()
        if update_fn is not None:
            batch = rollout_fn(carry, self._next_rng())[1]
            t_arg_u = jnp.asarray(0.0, jnp.float32)
            update_ms, update_ms_repeats = timeit(
                jax.jit(update_fn),
                (carry, batch, t_arg_u, self._next_rng()),
                # chain the updated carry (fresh params each repeat — the
                # batch alone repeating would hit execution memoization)
                lambda out: (out, batch, t_arg_u, self._next_rng()),
            )
        else:
            update_ms = update_ms_residual
            update_ms_repeats = []

        result = {
            "iteration_ms": iter_ms,
            "rollout_ms": rollout_ms,
            "update_ms": update_ms,
            "update_ms_residual": update_ms_residual,
            "update_ms_direct": update_fn is not None,
            "steps_per_sec": steps_per_iter / (iter_ms / 1000.0),
            "rollout_steps_per_sec": steps_per_iter / (rollout_ms / 1000.0),
            # per-repeat dispersion (VERDICT r4 next #3): chained-input
            # wall times for each phase, so consumers can report
            # median/min/max instead of a single draw from a +-10-25%
            # run-to-run noise band
            "iteration_ms_repeats": iter_ms_repeats,
            "rollout_ms_repeats": rollout_ms_repeats,
            "update_ms_repeats": update_ms_repeats,
            "steps_per_sec_repeats": [
                steps_per_iter / (ms / 1000.0) for ms in iter_ms_repeats
            ],
        }
        self.perf_stats.phase_breakdown = {
            "Rollout time per iter (ms)": rollout_ms,
            "Update time per iter (ms)": update_ms,
            "Rollout steps per sec": result["rollout_steps_per_sec"],
        }
        return result

    def _flat_apply(self, apply):
        """Collapse all leading dims to ONE batch dim around a trailing-
        feature apply: XLA lowers a dot_general with several leading dims
        (T, E, A, F) measurably worse than the equivalent 2-D matmul
        (2.5x on v5e, ``artifacts/round2/tpu_update_anatomy5.log``).

        SHARDING GUARD: on a multi-chip mesh the update batch is sharded
        on the env axis (dim 1 of (T, E, ...)); merging it into one dim
        whose major factor is T is a reshape GSPMD cannot keep sharded —
        it inserts all-gathers that replicate the whole batch onto every
        device (confirmed on an 8-device CPU mesh: 3 all-gathers vs 0).
        With a mesh the apply is returned unchanged; the leading-dim
        lowering penalty is the lesser cost.
        """
        if getattr(self.engine, "mesh", None) is not None:
            return apply

        def f(p, obs, *rest, **kw):
            lead = obs.shape[:-1]
            if len(lead) <= 1:
                return apply(p, obs, *rest, **kw)

            def fl(a):
                return a.reshape((-1,) + a.shape[len(lead):])

            out = apply(
                p, fl(obs), *[fl(r) for r in rest],
                **{k: (None if v is None else fl(v)) for k, v in kw.items()},
            )
            return jax.tree_util.tree_map(
                lambda o: o.reshape(lead + o.shape[1:]), out
            )

        return f

    def _build_hot_iteration_fn(self):
        """The metrics-free iteration builder when the subclass supports
        it (signature-checked so a genuine ``TypeError`` raised inside the
        build still propagates); otherwise the full-metrics builder."""
        import inspect

        if "with_metrics" in inspect.signature(
            self._build_iteration_fn
        ).parameters:
            return self._build_iteration_fn(with_metrics=False)
        return self._build_iteration_fn()

    def _eager_iteration(self, timestep):  # pragma: no cover - subclass
        raise NotImplementedError(
            "this trainer does not support the eager CPU backend; use "
            "EnvEngine under JAX_PLATFORMS=cpu instead"
        )

    def _eager_ep_bookkeep(self, rewards: np.ndarray, done: np.ndarray):
        """Episodic reward accounting for the eager rollout paths
        (reference ``trainer_base.py:585-601``); also soft-resets finished
        envs.  Returns nothing; accumulates on ``self``."""
        if not hasattr(self, "_ep_acc"):
            self._ep_acc = np.zeros_like(rewards)
            self._ep_sum = 0.0
            self._ep_count = 0.0
        self._ep_acc = self._ep_acc + rewards
        dm = done > 0
        if dm.any():
            self._ep_sum += float(self._ep_acc[dm].mean(axis=1).sum())
            self._ep_count += float(dm.sum())
            self._ep_acc[dm] = 0.0
            self.engine.reset_only_done_envs()

    @property
    def _eager_mean_ep_reward(self) -> float:
        return getattr(self, "_ep_sum", 0.0) / max(
            getattr(self, "_ep_count", 0.0), 1.0
        )

    def profile_trace(self, logdir: str, iterations: int = 3) -> str:
        """
        Capture a ``jax.profiler`` trace of ``iterations`` un-donated
        training iterations (viewable in TensorBoard / Perfetto) — the deep
        complement to :meth:`profile_phases`; replaces the reference's
        cuda-event timers with XLA's own op-level timeline.

        Traces the HOT (metrics-free) program where the trainer provides
        one — that is what every non-log production iteration runs, and
        the two programs compile differently (the full-metrics program
        keeps an unfused forward pass, 2.25x slower).
        """
        assert self._iteration_fn is not None and self._carry is not None
        undonated = jax.jit(self._build_hot_iteration_fn())
        carry = jax.tree_util.tree_map(jnp.copy, self._carry)
        t0 = jnp.asarray(0.0, jnp.float32)
        out, _ = undonated(carry, t0)  # compile outside the trace
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        # chain each iteration's output carry into the next input: some TPU
        # runtimes memoize repeated identical (program, inputs) executions
        # (CLAUDE.md rule 5) — replaying (carry, t0) would trace a cache
        carry = out
        with jax.profiler.trace(logdir):
            for _ in range(iterations):
                carry, _ = undonated(carry, t0)
            jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
        return logdir

    def graceful_close(self):
        """No curand heap to free on TPU (reference ``:681-687``); sync only."""
        if self._carry is not None:
            jax.block_until_ready(jax.tree_util.tree_leaves(self._carry)[0])
        logging.info("Trainer exits gracefully")
