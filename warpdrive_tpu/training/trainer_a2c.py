"""
TrainerA2C: on-policy trainer for A2C and PPO policies.

Parity with reference ``warp_drive/training/trainers/trainer_a2c.py:43-384``,
re-architected so one jitted program per iteration performs:

  lax.scan over training_batch_size_per_env:
      per-policy model forward on the obs placeholder  (reference :159-216)
      categorical action sampling                       (PyCUDASampler :532-572)
      vmapped env step                                  (kernel launch :380-390)
      reward/done bookkeeping                           (:514-583)
      done-driven auto-reset                            (reset kernels :420-422)
  then, per trained policy:
      whole-batch forward + A2C/PPO loss                (:218-339)
      grad clip + Adam + LR schedule                    (:280-295)

Multi-device: the iteration function is compiled with the env axis of every
state/batch array sharded over the mesh's 'env' axis; XLA inserts the gradient
all-reduce (replacing torch DDP, reference :137-146).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from warpdrive_tpu.algos.policygradient import A2C, PPO
from warpdrive_tpu.models.factory import ModelFactory
from warpdrive_tpu.sampling.samplers import sample_from_logits
from warpdrive_tpu.training.param_scheduler import ParamScheduler
from warpdrive_tpu.training.trainer_base import TrainerBase
from warpdrive_tpu.utils.constants import Constants

_OBS = Constants.OBSERVATIONS
_REWARDS = Constants.REWARDS
_DONE = Constants.DONE


class TrainerA2C(TrainerBase):
    """A2C/PPO trainer over one or more policies."""

    def __init__(self, env_wrapper=None, config=None, **kwargs):
        super().__init__(env_wrapper=env_wrapper, config=config, **kwargs)

        self.algorithms = {}
        self.lr_schedules = {}
        self.optimizers = {}
        self._head_dims = {}
        # optimizer epochs per iteration batch; >1 enables true multi-epoch
        # PPO with fixed behavior-policy log-probs (beyond reference parity,
        # whose PPO is single-epoch, ppo.py:129-136)
        self.ppo_num_epochs = {}
        # minibatches per epoch, sliced on the ENV axis so the per-env
        # return recursion stays exact (standard PPO minibatching; beyond
        # reference parity)
        self.ppo_num_minibatches = {}
        self.policy_remat = {}
        self.mb_shuffle = {}
        self.env_major_cfg = {}

        # trainer.update_recompute_obs: on split-step envs, the rollout
        # records the compact PHYSICAL state per step instead of the
        # (T, E, A, F) observation batch; the update re-derives observations
        # inside the loss forward (engine.observe on each stored state).
        # Extends docs/performance.md §3 ("observations are derived, not
        # carried") from the rollout carry to the training batch: the
        # dominant HBM buffer shrinks ~9-15x on the flagship (the reference
        # must materialize the whole obs batch for its torch forward,
        # trainer_a2c.py:218-259).  Costs one extra obs build per update
        # pass — a throughput A/B, hence a knob; memory-bound configs want
        # it on.
        self._recompute_obs = (
            bool(config["trainer"].get("update_recompute_obs", False))
            and self.engine.has_split_step
            and not self._is_eager
        )

        init_rng = self._next_rng()
        self.engine.reset_all_envs()  # builds the initial state

        for tag in self.policies:
            policy_cfg = config["policy"][tag]
            heads, act_dtype, is_det = self._action_heads(tag)
            assert not is_det, (
                "A2C/PPO need categorical action spaces; use TrainerDDPG for "
                "Box actions"
            )
            self._head_dims[tag] = heads

            model_cfg = policy_cfg["model"]
            model_cls = ModelFactory.create(model_cfg["type"])
            model_kwargs = {}
            if model_cfg.get("dtype"):  # e.g. "bfloat16" for MXU throughput
                model_kwargs["dtype"] = jnp.dtype(model_cfg["dtype"])
            model = model_cls(
                fc_dims=tuple(model_cfg["fc_dims"]),
                output_dims=tuple(heads),
                **model_kwargs,
            )
            self.models[tag] = model

            obs_flat, _ = self._policy_obs_and_mask(
                {k: jnp.asarray(v) for k, v in self.engine.state.items()},
                None,
                tag,
            )
            init_rng, sub = jax.random.split(init_rng)
            self.params[tag] = model.init(sub, obs_flat[:1])

            algo_name = policy_cfg.get("algorithm", "A2C").upper()
            common = dict(
                discount_factor_gamma=policy_cfg.get("gamma", 0.98),
                normalize_advantage=policy_cfg.get("normalize_advantage", False),
                normalize_return=policy_cfg.get("normalize_return", False),
                vf_loss_coeff=policy_cfg.get("vf_loss_coeff", 0.01),
                entropy_coeff=policy_cfg.get("entropy_coeff", 0.01),
            )
            if algo_name == "A2C":
                self.algorithms[tag] = A2C(**common)
            elif algo_name == "PPO":
                self.algorithms[tag] = PPO(
                    clip_param=policy_cfg.get("clip_param", 0.1), **common
                )
            else:
                raise NotImplementedError(
                    f"TrainerA2C supports A2C/PPO, got {algo_name!r}"
                )

            self.ppo_num_epochs[tag] = int(policy_cfg.get("num_epochs", 1))
            self.ppo_num_minibatches[tag] = int(
                policy_cfg.get("num_minibatches", 1)
            )
            # remat: recompute policy activations in the update's backward
            # pass instead of storing them for the whole (T, E, N) batch —
            # the stored hidden layers are the HBM peak of an A2C update
            # (e.g. 500x400x100x256 f32 = 20 GB, an OOM on a 16 GB chip);
            # numerically exact, costs ~1 extra forward
            self.policy_remat[tag] = bool(policy_cfg.get("remat", False))
            # env-major batch relayout: True / False / "auto" (default).
            # "auto" enables it only for SMALL env-slices (<= 31 envs
            # per minibatch): the one-time full-batch moveaxis then pays
            # for itself in contiguous per-mb slices (flagship mb400 =
            # 5 envs/mb: update 210 -> 178 ms), while at larger slices
            # the transpose dominates (gridworld mb64 = 500 envs/mb:
            # 26.2M -> 18.5M steps/s time-major vs env-major,
            # /tmp/gw_envmajor_ab round-5 A/B).
            self.env_major_cfg[tag] = policy_cfg.get("env_major", "auto")
            # shuffle_minibatches=False slices contiguous env blocks with
            # lax.dynamic_slice instead of a per-minibatch env-axis gather
            # (jnp.take) — gathers lower poorly on TPU. Env replicas are
            # iid, so for single-epoch A2C the block split is statistically
            # equivalent to a shuffled one; multi-epoch PPO keeps the
            # shuffle by default so minibatch composition varies per epoch.
            self.mb_shuffle[tag] = bool(
                policy_cfg.get(
                    "shuffle_minibatches", self.ppo_num_epochs[tag] > 1
                )
            )
            assert self.num_envs % self.ppo_num_minibatches[tag] == 0, (
                "num_minibatches must divide num_envs (env-axis slicing)"
            )
            self.lr_schedules[tag] = ParamScheduler(policy_cfg.get("lr", 1e-3))
            chain = []
            if policy_cfg.get("clip_grad_norm", True):
                chain.append(
                    optax.clip_by_global_norm(policy_cfg.get("max_grad_norm", 0.5))
                )
            chain += [optax.scale_by_adam(), optax.scale(-1.0)]
            self.optimizers[tag] = optax.chain(*chain)
            self.opt_states[tag] = self.optimizers[tag].init(self.params[tag])

            ckpt = model_cfg.get("model_ckpt_filepath", "")
            if ckpt:
                self.load_model_checkpoint({tag: ckpt})

        if self._is_eager:
            # eager CPU backend: no pure env step to fuse — params stay in
            # self.params, rollout runs per-step python, update stays jitted
            self._eager_update_fn = jax.jit(self._make_update())
        else:
            self._carry = self._maybe_shard_carry(self._init_carry())
            self._iteration_fn = jax.jit(
                self._build_iteration_fn(), donate_argnums=(0,)
            )
            # the HOT program is metrics-free (plain jax.grad — keeping
            # even scalar loss outputs blocks XLA's forward-into-backward
            # fusion, 2.25x slower measured on v5e, see _make_update);
            # train() runs it on every non-log iteration
            self._iteration_fn_fast = jax.jit(
                self._build_iteration_fn(with_metrics=False),
                donate_argnums=(0,),
            )
        self._act_fn = jax.jit(self._build_act_fn(), static_argnames=("use_argmax",))

    # ------------------------------------------------------------ program
    def _init_carry(self):
        return {
            "env_state": self._rollout_env_state(),
            "params": dict(self.params),
            "opt": dict(self.opt_states),
            "rng": self._next_rng(),
            # episodic reward accounting (reference trainer_base.py:585-601)
            "ep_acc": jnp.zeros(
                (self.num_envs, self.engine.n_agents), dtype=jnp.float32
            ),
            "ep_sum": jnp.zeros((), dtype=jnp.float32),
            "ep_count": jnp.zeros((), dtype=jnp.float32),
        }

    def _rebuild_carry_params(self, loaded=None):
        """Write freshly-loaded policy params into the live carry.

        Only the ``loaded`` policies are touched: after the first jitted
        iteration the other ``self.params`` entries alias buffers that were
        DONATED to the program — copying them wholesale would reinsert
        deleted arrays into the carry (mid-run partial reload crash)."""
        if self._carry is None:
            return
        for tag in (self.params if loaded is None else loaded):
            self._carry["params"][tag] = jax.tree_util.tree_map(
                jnp.asarray, self.params[tag]
            )

    def _policy_forward(self, tag, params, obs_flat, action_mask=None,
                        remat=False):
        """Model forward; ``action_mask`` (1 keep / 0 forbid, concatenated
        over action components — reference ``model_base.py:203-213``) drives
        masked logits when the env exposes an ``action_mask`` state array.
        ``remat=True`` (loss paths only) wraps the apply in
        ``jax.checkpoint`` so the backward pass recomputes activations
        instead of storing them for the whole batch."""
        apply = self.models[tag].apply
        if remat:
            apply = jax.checkpoint(apply)
        # collapse leading batch dims around the apply (mesh-aware: no-op
        # when the env axis is sharded — see TrainerBase._flat_apply)
        return self._flat_apply(apply)(
            params, obs_flat, action_mask=action_mask
        )

    # _gather_policy_mask / _policy_obs_and_mask live in TrainerBase.

    def _sample_policy_actions(self, tag, key, logits_list, use_argmax=False):
        """One categorical draw per action component -> (E, Ap, C) int32."""
        keys = jax.random.split(key, len(logits_list))
        cols = [
            sample_from_logits(k, logits, use_argmax=use_argmax)
            for k, logits in zip(keys, logits_list)
        ]
        return jnp.stack(cols, axis=-1)

    # _scatter_actions lives in TrainerBase; discrete action components
    _action_dtype = jnp.int32

    def _derive_obs(self, phys_batch, tag):
        """Re-derive one policy's (T, E, A_p, F) observations (+ mask) from
        the recorded physical-state batch (``update_recompute_obs``): vmap
        ``engine.observe`` + the policy gather over the time axis — the
        same code path the rollout used, so the update sees the exact
        observations the actions were sampled from (up to reduction-order
        rounding across the two programs)."""

        def one(ph):
            obs_all = self.engine.observe(ph)
            return self._policy_obs_and_mask(ph, obs_all, tag)

        return jax.vmap(one)(phys_batch)

    def _build_act_fn(self):
        """(params, env_state, key[, use_argmax]) -> actions for all agents."""

        def act(params, env_state, key, use_argmax=False):
            per_policy = {}
            keys = jax.random.split(key, len(self.policies))
            for k, tag in zip(keys, self.policies):
                obs_p, mask_p = self._policy_obs_and_mask(env_state, None, tag)
                logits_list, _ = self._policy_forward(
                    tag, params[tag], obs_p, action_mask=mask_p
                )
                per_policy[tag] = self._sample_policy_actions(
                    tag, k, logits_list, use_argmax=use_argmax
                )
            if self.engine.separate_placeholders:
                return per_policy
            return self._scatter_actions(per_policy)

        return act

    def _make_rollout(self):
        """The rollout scan as a standalone jittable: shared by the fused
        iteration program and the rollout-only profiling program
        (``TrainerBase.profile_phases``)."""
        engine = self.engine
        policies = list(self.policies)
        # optional reduced-precision storage for the (T, E, A, F) obs batch
        # (trainer.batch_dtype: "bfloat16") — halves the dominant training
        # buffer's HBM footprint; the loss forward upcasts via the model
        batch_dtype = jnp.dtype(
            self.config["trainer"].get("batch_dtype", "float32")
        )
        recompute_obs = self._recompute_obs

        def rollout(params, rollout_carry, step_keys):
            def rollout_step(rs_carry, key_t):
                env_state, ep_acc, ep_sum, ep_count = rs_carry
                k_sample, k_reset = jax.random.split(key_t)

                obs_all = (
                    engine.observe(env_state) if engine.has_split_step else None
                )
                per_policy_actions = {}
                rec = {}
                if recompute_obs:
                    # record the PRE-step physical state (what observe reads)
                    # instead of any obs batch; rewards/done are recorded
                    # separately below
                    rec["phys"] = {
                        k: v
                        for k, v in env_state.items()
                        if k != _DONE and not k.startswith(_REWARDS)
                    }
                sample_keys = jax.random.split(k_sample, len(policies))
                for sk, tag in zip(sample_keys, policies):
                    obs_p, mask_p = self._policy_obs_and_mask(
                        env_state, obs_all, tag
                    )
                    logits_list, _ = self._policy_forward(
                        tag, params[tag], obs_p, action_mask=mask_p
                    )
                    actions_p = self._sample_policy_actions(tag, sk, logits_list)
                    per_policy_actions[tag] = actions_p
                    rec[f"actions_{tag}"] = actions_p
                    if not recompute_obs:
                        rec[f"obs_{tag}"] = obs_p.astype(batch_dtype)
                        if mask_p is not None:
                            rec[f"mask_{tag}"] = mask_p

                actions = (
                    per_policy_actions
                    if engine.separate_placeholders
                    else self._scatter_actions(per_policy_actions)
                )
                env_state = (
                    engine.step_physics(env_state, actions)
                    if engine.has_split_step
                    else engine.step(env_state, actions)
                )

                rewards = engine.rewards_of(env_state)
                done = env_state[_DONE]
                for tag in policies:
                    if engine.separate_placeholders:
                        rec[f"rewards_{tag}"] = env_state[f"{_REWARDS}_{tag}"]
                    else:
                        ids = jnp.asarray(self.policy_tag_to_agent_id_map[tag])
                        rec[f"rewards_{tag}"] = jnp.take(rewards, ids, axis=1)
                rec["done"] = done

                # episodic reward bookkeeping (reference :585-601)
                ep_acc = ep_acc + rewards
                done_mask = (done > 0).astype(jnp.float32)
                ep_sum = ep_sum + (ep_acc.mean(axis=1) * done_mask).sum()
                ep_count = ep_count + done_mask.sum()
                ep_acc = ep_acc * (1.0 - done_mask)[:, None]

                env_state = engine.auto_reset(env_state, k_reset)
                return (env_state, ep_acc, ep_sum, ep_count), rec

            return jax.lax.scan(rollout_step, rollout_carry, step_keys)

        return rollout

    def _build_rollout_profile_fn(self):
        """(carry, rng) -> rollout outputs only; used for phase timing."""
        rollout = self._make_rollout()
        T = self.training_batch_size_per_env

        def run(carry, rng):
            step_keys = jax.random.split(rng, T)
            return rollout(
                carry["params"],
                (
                    carry["env_state"],
                    carry["ep_acc"],
                    carry["ep_sum"],
                    carry["ep_count"],
                ),
                step_keys,
            )

        return run

    def _build_update_profile_fn(self):
        """(carry, batch, timestep, key) -> new carry; update phase only
        (direct timing for ``TrainerBase.profile_phases``)."""
        update = self._make_update(with_metrics=False)

        def run(carry, batch, timestep, k_down):
            new_params, new_opt, _ = update(
                carry["params"], carry["opt"], batch, timestep, k_down
            )
            return {**carry, "params": new_params, "opt": new_opt}

        return run

    def _make_update(self, with_metrics=True):
        """The per-policy loss/optimizer update as a standalone jittable,
        shared by the fused iteration program and the eager CPU-backend
        path: ``update(params_all, opt_all, batch, timestep, k_down) ->
        (new_params, new_opt, metrics)``.

        ``with_metrics=False`` compiles the HOT form: plain ``jax.grad``
        with NO value/aux outputs and an empty metrics dict. Keeping even
        the scalar loss as a program output forces XLA to materialize the
        forward pass separately from the backward — measured 2.25x slower
        on a v5e (853 vs 380 ms for the flagship runner update,
        artifacts/round2/tpu_update_anatomy7.log). The trainer runs the
        metrics-free program every iteration and the full-metrics one only
        at metrics-log points."""
        trained = list(self.policies_to_train)

        def update(params_all, opt_all, batch, timestep, k_down):
            new_params = dict(params_all)
            new_opt = dict(opt_all)
            all_metrics = {}
            down_keys = jax.random.split(k_down, max(len(trained), 1))
            for dk, tag in zip(down_keys, trained):
                algo = self.algorithms[tag]
                if self._recompute_obs:
                    obs_b, mask_b, phys_b = None, None, batch["phys"]
                else:
                    obs_b, phys_b = batch[f"obs_{tag}"], None
                    mask_b = batch.get(f"mask_{tag}")
                act_b = batch[f"actions_{tag}"]
                rew_b = batch[f"rewards_{tag}"]
                done_b = batch["done"]

                def loss_fn(p, old_lp=None, tag=tag, obs_b=obs_b, act_b=act_b,
                            rew_b=rew_b, done_b=done_b, dk=dk, algo=algo,
                            mask_b=mask_b, phys_b=phys_b):
                    if obs_b is None:
                        obs_b, mask_b = self._derive_obs(phys_b, tag)
                    logits_list, values = self._policy_forward(
                        tag, p, obs_b, action_mask=mask_b,
                        remat=self.policy_remat.get(tag, False),
                    )
                    return algo.compute_loss_and_metrics(
                        timestep,
                        act_b,
                        rew_b,
                        done_b,
                        logits_list,
                        values,
                        negative_positive_ratio=self.neg_pos_env_ratio,
                        downsample_key=dk,
                        old_log_prob=old_lp,
                    )

                num_epochs = self.ppo_num_epochs.get(tag, 1)
                num_mb = self.ppo_num_minibatches.get(tag, 1)
                lr_t = self.lr_schedules[tag].value_at(timestep)
                p_cur = params_all[tag]
                opt_cur = opt_all[tag]
                from warpdrive_tpu.algos.policygradient import PPO as _PPO

                from warpdrive_tpu.algos.policygradient import (
                    _logp_and_entropy,
                )

                mb_old_lp = False
                if (num_epochs > 1 or num_mb > 1) and isinstance(algo, _PPO):
                    # multi-epoch PPO (beyond reference parity): fix the
                    # behavior-policy log-probs before the first update so
                    # the clipped ratio is meaningful across epochs. A2C
                    # never reads old_log_prob, so skip this full-batch
                    # forward when only minibatching an A2C update.
                    if obs_b is None:
                        # update_recompute_obs: deriving the FULL obs batch
                        # here would materialize exactly the tensor the
                        # knob exists to avoid — compute the behavior
                        # log-probs per minibatch inside mb_loss instead
                        # (at the pre-update params p0, one extra forward
                        # per epoch worth of FLOPs, zero extra storage)
                        old_lp = None
                        mb_old_lp = True
                    else:
                        logits0, _ = self._policy_forward(
                            tag, p_cur, obs_b, action_mask=mask_b
                        )
                        old_lp, _ = _logp_and_entropy(
                            logits0, batch[f"actions_{tag}"]
                        )
                        old_lp = jax.lax.stop_gradient(old_lp)
                else:
                    old_lp = None
                p0 = p_cur  # behavior params for mb_old_lp

                def apply_grads(p_cur, opt_cur, grads):
                    updates, opt_cur = self.optimizers[tag].update(
                        grads, opt_cur, p_cur
                    )
                    updates = jax.tree_util.tree_map(
                        lambda u: u * lr_t, updates
                    )
                    return optax.apply_updates(p_cur, updates), opt_cur

                E = rew_b.shape[1]
                mb_size = E // num_mb
                if num_epochs == 1 and num_mb == 1:
                    if with_metrics:
                        grads, metrics = jax.grad(loss_fn, has_aux=True)(
                            p_cur, old_lp
                        )
                        metrics["Gradient norm"] = optax.global_norm(grads)
                    else:
                        grads = jax.grad(
                            lambda p, olp: loss_fn(p, olp)[0]
                        )(p_cur, old_lp)
                        metrics = {}
                    p_cur, opt_cur = apply_grads(p_cur, opt_cur, grads)
                else:
                    # env-axis minibatches: per-env returns are computed
                    # inside the loss on each slice and are EXACT (the
                    # time recursion never crosses envs); samples reshuffle
                    # every epoch. The epoch x minibatch sweep is ONE
                    # lax.scan over a precomputed index table, so the
                    # compiled program holds a single minibatch body no
                    # matter how many passes run (large-program AOT
                    # compiles at flagship scale stay small).
                    shuffle = self.mb_shuffle.get(tag, True)
                    epoch_ids = jnp.arange(num_epochs, dtype=jnp.uint32)
                    epoch_keys = jax.vmap(
                        lambda e: jax.random.fold_in(dk, e)
                    )(epoch_ids)
                    if shuffle:
                        perms = jax.vmap(
                            lambda kk: jax.random.permutation(kk, E)
                        )(epoch_keys)  # (num_epochs, E)
                        idx_tab = perms.reshape(num_epochs * num_mb, mb_size)
                    else:
                        # contiguous env blocks: idx_tab carries the block
                        # START offsets; slicing is a dynamic_slice, not a
                        # gather (TPU gathers on the env axis are slow)
                        idx_tab = jnp.tile(
                            jnp.arange(num_mb, dtype=jnp.int32) * mb_size,
                            (num_epochs,),
                        )
                    dk_seq = jnp.repeat(epoch_keys, num_mb, axis=0)

                    # env-major obs fast path (round 4): with contiguous
                    # env blocks, transpose the BIG per-sample tensors
                    # ONCE to (E, T, A, F) so every minibatch slice is a
                    # contiguous leading-axis block whose flatten into
                    # the policy matmul is layout-free.  The mb400
                    # update trace (artifacts/round4/trace_update_mb400)
                    # showed the per-mb time-major dynamic_slice+reshape
                    # copies costing 41 of 178 device-ms.  Gated off for
                    # shuffled minibatches (gather path), recompute-obs,
                    # and PPO behavior-log-prob alignment.
                    import os as _os

                    _em_cfg = self.env_major_cfg.get(tag, "auto")
                    env_major = (
                        not shuffle and obs_b is not None
                        and old_lp is None and not mb_old_lp
                        # a mesh shards the env axis: a dynamic_slice
                        # along it would cross shard boundaries — keep
                        # the time-major path there
                        and getattr(self.engine, "mesh", None) is None
                        # per-policy knob with a measured-size "auto"
                        # default (see env_major_cfg in __init__)
                        and (
                            _em_cfg is True
                            or (_em_cfg == "auto" and mb_size <= 31)
                        )
                        # escape hatch for A/Bs and the parity test.
                        # BUILD-TIME ONLY: read once while tracing the
                        # update program — toggling the env var after
                        # the trainer is constructed has no effect
                        and not _os.environ.get("WD_NO_ENV_MAJOR")
                    )
                    if env_major:
                        obs_em = jnp.moveaxis(obs_b, 0, 1)
                        mask_em = (
                            None if mask_b is None
                            else jnp.moveaxis(mask_b, 0, 1)
                        )
                    else:
                        obs_em = mask_em = None

                    def mb_loss(p, old_lp_full, idx, dk_e, tag=tag,
                                algo=algo, mask_b=mask_b,
                                obs_em=obs_em, mask_em=mask_em):
                        if shuffle:
                            take = lambda x: (
                                None if x is None
                                else jnp.take(x, idx, axis=1)
                            )
                        else:
                            take = lambda x: (
                                None if x is None
                                else jax.lax.dynamic_slice_in_dim(
                                    x, idx, mb_size, axis=1
                                )
                            )
                        if obs_b is None:
                            # slice the physical state, derive obs for this
                            # minibatch only (never materializes the full
                            # obs batch)
                            phys_mb = jax.tree_util.tree_map(take, phys_b)
                            obs_mb, mask_mb = self._derive_obs(phys_mb, tag)
                        elif obs_em is not None:
                            # env-major fast path: contiguous leading-axis
                            # block — the flatten into the policy matmul
                            # is layout-free (no per-mb reshape copy)
                            obs_mb = jax.lax.dynamic_slice_in_dim(
                                obs_em, idx, mb_size, axis=0
                            )
                            mask_mb = (
                                None if mask_em is None
                                else jax.lax.dynamic_slice_in_dim(
                                    mask_em, idx, mb_size, axis=0
                                )
                            )
                        else:
                            obs_mb, mask_mb = take(obs_b), take(mask_b)
                        act_mb = take(act_b)
                        olp_mb = take(old_lp_full)
                        if mb_old_lp:
                            # recompute-obs PPO: behavior log-probs from the
                            # pre-update params on THIS minibatch's obs
                            logits0_mb, _ = self._policy_forward(
                                tag, p0, obs_mb, action_mask=mask_mb
                            )
                            olp_mb, _ = _logp_and_entropy(logits0_mb, act_mb)
                            olp_mb = jax.lax.stop_gradient(olp_mb)
                        logits_list, values = self._policy_forward(
                            tag, p, obs_mb,
                            action_mask=mask_mb,
                            remat=self.policy_remat.get(tag, False),
                        )
                        if obs_b is not None and obs_em is not None:
                            # forward outputs are (E_mb, T, A, ...) in the
                            # env-major path; the loss math stays
                            # time-major — transpose the SMALL outputs
                            # back (logits/values are ~1% of obs bytes)
                            logits_list = [
                                jnp.moveaxis(lg, 0, 1) for lg in logits_list
                            ]
                            if values is not None:
                                values = jnp.moveaxis(values, 0, 1)
                        return algo.compute_loss_and_metrics(
                            timestep,
                            act_mb,
                            take(rew_b),
                            take(done_b),
                            logits_list,
                            values,
                            negative_positive_ratio=self.neg_pos_env_ratio,
                            downsample_key=dk_e,
                            old_log_prob=olp_mb,
                        )

                    def mb_step(c, inp):
                        p_c, opt_c = c
                        idx, dk_e = inp
                        if with_metrics:
                            grads, metrics = jax.grad(
                                mb_loss, has_aux=True
                            )(p_c, old_lp, idx, dk_e)
                            metrics["Gradient norm"] = optax.global_norm(
                                grads
                            )
                        else:
                            grads = jax.grad(
                                lambda *a: mb_loss(*a)[0]
                            )(p_c, old_lp, idx, dk_e)
                            metrics = {}
                        p_c, opt_c = apply_grads(p_c, opt_c, grads)
                        return (p_c, opt_c), metrics

                    (p_cur, opt_cur), metrics_seq = jax.lax.scan(
                        mb_step, (p_cur, opt_cur), (idx_tab, dk_seq)
                    )
                    metrics = jax.tree_util.tree_map(
                        lambda x: x[-1], metrics_seq
                    )
                new_params[tag] = p_cur
                new_opt[tag] = opt_cur
                if with_metrics:
                    metrics["Current timestep"] = timestep
                    metrics["Learning rate"] = lr_t
                    all_metrics[tag] = metrics
            return new_params, new_opt, all_metrics

        return update

    def _build_iteration_fn(self, with_metrics=True):
        T = self.training_batch_size_per_env
        rollout = self._make_rollout()
        update = self._make_update(with_metrics=with_metrics)

        def iteration(carry, timestep):
            params = carry["params"]
            rng, k_roll, k_down = jax.random.split(carry["rng"], 3)
            step_keys = jax.random.split(k_roll, T)

            (env_state, ep_acc, ep_sum, ep_count), batch = rollout(
                params,
                (
                    carry["env_state"],
                    carry["ep_acc"],
                    carry["ep_sum"],
                    carry["ep_count"],
                ),
                step_keys,
            )

            new_params, new_opt, all_metrics = update(
                carry["params"], carry["opt"], batch, timestep, k_down
            )

            mean_ep_reward = ep_sum / jnp.maximum(ep_count, 1.0)
            for tag in all_metrics:
                all_metrics[tag]["Mean episodic reward"] = mean_ep_reward

            new_carry = {
                "env_state": env_state,
                "params": new_params,
                "opt": new_opt,
                "rng": rng,
                "ep_acc": ep_acc,
                "ep_sum": ep_sum,
                "ep_count": ep_count,
            }
            return new_carry, all_metrics

        return iteration

    # ------------------------------------------------------- eager backend
    def _eager_iteration(self, timestep):
        """One training iteration against an eager (CPU numpy-env) engine:
        python per-step rollout — the reference's own hot-loop structure
        (``trainer_base.py:383-428``) — with the jitted act fn and the same
        jitted update program as the fused path."""
        eng = self.engine
        T = self.training_batch_size_per_env
        recs = []
        for _ in range(T):
            key = self._next_rng()
            st = eng.state
            per_policy = {}
            rec = {}
            sample_keys = jax.random.split(key, len(self.policies))
            for sk, tag in zip(sample_keys, self.policies):
                obs_p, mask_p = self._policy_obs_and_mask(st, None, tag)
                logits_list, _ = self._policy_forward(
                    tag, self.params[tag], obs_p, action_mask=mask_p
                )
                actions_p = self._sample_policy_actions(tag, sk, logits_list)
                per_policy[tag] = actions_p
                rec[f"obs_{tag}"] = np.asarray(obs_p)
                rec[f"actions_{tag}"] = np.asarray(actions_p)
                if mask_p is not None:
                    rec[f"mask_{tag}"] = np.asarray(mask_p)
            actions = np.asarray(self._scatter_actions(per_policy))
            out = eng.step_all_envs(actions)
            rewards = np.asarray(out[_REWARDS])
            done = np.asarray(out[_DONE])
            for tag in self.policies:
                ids = self.policy_tag_to_agent_id_map[tag]
                rec[f"rewards_{tag}"] = rewards[:, ids]
            rec["done"] = done
            recs.append(rec)
            self._eager_ep_bookkeep(rewards, done)

        batch = {k: np.stack([r[k] for r in recs]) for k in recs[0]}
        self.params, self.opt_states, metrics = self._eager_update_fn(
            dict(self.params), dict(self.opt_states), batch,
            jnp.asarray(timestep, jnp.float32), self._next_rng(),
        )
        self.params = dict(self.params)
        self.opt_states = dict(self.opt_states)
        for tag in metrics:
            metrics[tag]["Mean episodic reward"] = jnp.asarray(
                self._eager_mean_ep_reward
            )
        return metrics

    # ----------------------------------------------------- eval / fetching
    # evaluate_episodes lives in TrainerBase (done-masked, reference parity).

    def fetch_episode_states(
        self,
        list_of_states: list,
        env_id: int = 0,
        include_rewards_actions: bool = False,
        include_probabilities: bool = False,
    ):
        """
        Step one episode with the current policy, recording the requested
        state arrays of env ``env_id`` at every timestep
        (reference ``trainer_base.py:689-792``); returns a dict of
        (episode_length + 1, ...) numpy arrays truncated at the done step.
        """
        assert isinstance(list_of_states, list) and len(list_of_states) > 0
        if self._is_eager:
            assert not include_probabilities, (
                "include_probabilities is not supported on the eager CPU "
                "backend"
            )
            return self._fetch_episode_states_eager(
                list_of_states, env_id, include_rewards_actions
            )
        engine = self.engine
        for name in list_of_states:
            assert name in engine.state, f"{name!r} is not a state array"
        params = self._carry["params"]
        T = engine.episode_length

        def body(carry, key_t):
            st, t = carry
            k_act, _ = jax.random.split(key_t)
            actions = self._act_fn(params, st, k_act, use_argmax=False)
            rec = {}
            if include_probabilities:
                # per-policy per-component action probabilities of env_id
                # (reference ``trainer_base.py:756-776``)
                for tag in self.policies:
                    obs_p, _ = self._policy_obs_and_mask(st, None, tag)
                    logits_list, _ = self._policy_forward(tag, params[tag], obs_p)
                    for i, logits in enumerate(logits_list):
                        rec[f"_probs_{tag}_{i}"] = jax.nn.softmax(
                            logits[env_id], axis=-1
                        )
            st = engine.step(st, actions)
            rec.update({name: st[name][env_id] for name in list_of_states})
            if include_rewards_actions:
                rec["_rewards"] = engine.rewards_of(st)[env_id]
                # separate mode: merge the per-policy action dict
                a_rec = (
                    self._scatter_actions(actions)
                    if isinstance(actions, dict)
                    else actions
                )
                rec["_actions"] = a_rec[env_id]
            rec["_done"] = st[_DONE][env_id]
            return (st, t + 1), rec

        self.engine.reset_all_envs()
        state0 = dict(self.engine.state)
        first = {name: np.asarray(state0[name][env_id]) for name in list_of_states}
        keys = jax.random.split(self._next_rng(), T)
        (_, _), recs = jax.jit(lambda s, k: jax.lax.scan(body, (s, 0), k))(
            state0, keys
        )

        done_t = np.asarray(recs["_done"])
        end = int(np.argmax(done_t > 0)) + 1 if (done_t > 0).any() else T
        out = {}
        for name in list_of_states:
            stacked = np.concatenate(
                [first[name][None], np.asarray(recs[name])[:end]], axis=0
            )
            out[name] = stacked
        if include_rewards_actions:
            out["rewards"] = np.asarray(recs["_rewards"])[:end]
            out["actions"] = np.asarray(recs["_actions"])[:end]
        if include_probabilities:
            out["probabilities"] = {
                tag: [
                    np.asarray(recs[f"_probs_{tag}_{i}"])[:end]
                    for i in range(len(self._head_dims[tag]))
                ]
                for tag in self.policies
            }
        return out
