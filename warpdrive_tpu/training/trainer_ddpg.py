"""
TrainerDDPG: off-policy trainer for continuous (Box) action spaces.

Parity with reference ``warp_drive/training/trainers/trainer_ddpg.py:54-532``,
re-architected as one jitted program per iteration:

  lax.scan over training_batch_size_per_env:
      actor forward -> OU exploration noise -> env step -> auto-reset
      (reference :243-318 rollout with NumbaSampler.sample_ou_process)
  sliding-window replay update (reference RingBuffer, ``ring_buffer.py:5-87``)
  then, per trained policy, gated on the buffer being full (reference
  :319-334 "this should skip the first roll-out train only"):
      critic MSE vs n-step bootstrapped returns from the target nets,
      actor loss -mean Q(s, pi(s)) through a FROZEN critic,
      Adam + per-net LR schedules (:217-241), grad clip,
      soft target updates (:42-51, 412-413).

Deliberate deviation from the reference (documented, not an oversight): the
reference's ``actor_loss.backward()`` also deposits gradients into the
CRITIC's parameters, which its critic optimizer then applies alongside the
critic-loss gradients (``trainer_ddpg.py:385-410``).  Standard DDPG
(Lillicrap et al. 2015) freezes the critic in the actor update; we implement
the standard form -- ``jax.grad`` w.r.t. actor params only -- which is
strictly better-behaved.

The reference's circular RingBuffer (front/rear pointers over a device
tensor, unrolled with ``torch.roll``) becomes a time-ordered sliding window:
each iteration appends exactly T new rows to a ``(T + n_step - 1)``-row
buffer via ``concat(buf[T:], new)``, so ``unroll()`` order is the buffer
order itself -- no pointer arithmetic, no rolls.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from warpdrive_tpu.algos.ddpg import DDPG
from warpdrive_tpu.models.factory import ModelFactory
from warpdrive_tpu.sampling.samplers import sample_ou_process
from warpdrive_tpu.training.param_scheduler import ParamScheduler
from warpdrive_tpu.training.trainer_base import TrainerBase
from warpdrive_tpu.utils.constants import Constants

_OBS = Constants.OBSERVATIONS
_REWARDS = Constants.REWARDS
_DONE = Constants.DONE

_EPSILON = 1e-10


def soft_update(target_params, source_params, tau):
    """Polyak averaging (reference ``trainer_ddpg.py:42-47``)."""
    return jax.tree_util.tree_map(
        lambda t, s: t * (1.0 - tau) + s * tau, target_params, source_params
    )


class TrainerDDPG(TrainerBase):
    """DDPG trainer over one or more continuous-action policies."""

    def __init__(self, env_wrapper=None, config=None, **kwargs):
        super().__init__(env_wrapper=env_wrapper, config=config, **kwargs)

        self.algorithms = {}
        self.actor_models = {}
        self.critic_models = {}
        self.actor_lr_schedules = {}
        self.critic_lr_schedules = {}
        self.actor_optimizers = {}
        self.critic_optimizers = {}
        self.tau = {}
        self.policy_remat = {}
        self._num_action_dims = {}

        # replay window: T fresh rows per iteration + n_step - 1 history rows
        # (the reference sizes its batch container the same way,
        # ``trainer_base.py:246``)
        self.buffer_capacity = self.training_batch_size_per_env + self.n_step - 1

        # OU sampler params, schedulable (reference ``trainer_base.py:147-151``
        # + ``run_configs/single_pendulum.yaml`` sampler section)
        sampler_params = (config.get("sampler") or {}).get("params") or {}
        self.ou_damping = ParamScheduler(sampler_params.get("damping", 0.15))
        self.ou_stddev = ParamScheduler(sampler_params.get("stddev", 0.2))
        self.ou_scale = ParamScheduler(sampler_params.get("scale", 1.0))

        init_rng = self._next_rng()
        self.engine.reset_all_envs()  # builds the initial state

        actor_params = {}
        critic_params = {}
        for tag in self.policies:
            policy_cfg = config["policy"][tag]
            heads, _, is_det = self._action_heads(tag)
            assert is_det, (
                "TrainerDDPG requires Box action spaces; use TrainerA2C for "
                "categorical actions"
            )
            num_action_dims = len(heads)
            self._num_action_dims[tag] = num_action_dims
            space = self.act_space[tag]
            # symmetric bound scale from the Box space; the config's
            # ``output_w`` overrides (reference pendulum yaml ``output_w: 2.0``)
            high = float(np.max(np.abs(space.high)))
            model_cfg = policy_cfg["model"]
            actor_cfg = model_cfg["actor"]
            critic_cfg = model_cfg["critic"]
            output_w = float(actor_cfg.get("output_w", high if np.isfinite(high) else 1.0))

            actor_cls = ModelFactory.create(actor_cfg["type"])
            self.actor_models[tag] = actor_cls(
                fc_dims=tuple(actor_cfg["fc_dims"]),
                num_action_types=num_action_dims,
                action_scale=output_w,
            )
            critic_cls = ModelFactory.create(critic_cfg["type"])
            self.critic_models[tag] = critic_cls(fc_dims=tuple(critic_cfg["fc_dims"]))

            obs_flat, _ = self._policy_obs_and_mask(
                {k: jnp.asarray(v) for k, v in self.engine.state.items()},
                None,
                tag,
            )
            init_rng, k_a, k_c = jax.random.split(init_rng, 3)
            actor_params[tag] = self.actor_models[tag].init(k_a, obs_flat[:1])
            a0 = self.actor_models[tag].apply(actor_params[tag], obs_flat[:1])
            critic_params[tag] = self.critic_models[tag].init(
                k_c, obs_flat[:1], a0
            )

            assert policy_cfg.get("algorithm", "DDPG").upper() == "DDPG"
            self.algorithms[tag] = DDPG(
                discount_factor_gamma=policy_cfg.get("gamma", 0.99),
                normalize_advantage=policy_cfg.get("normalize_advantage", False),
                normalize_return=policy_cfg.get("normalize_return", False),
                n_step=self.n_step,
            )
            self.tau[tag] = float(policy_cfg.get("tau", 0.05))
            # remat: recompute actor/critic activations in the update's
            # backward pass instead of storing them for the whole replay
            # window batch (same memory lever as TrainerA2C; exact)
            self.policy_remat[tag] = bool(policy_cfg.get("remat", False))

            lr_cfg = policy_cfg.get("lr", 1e-3)
            if isinstance(lr_cfg, dict):
                actor_lr, critic_lr = lr_cfg["actor"], lr_cfg["critic"]
            else:
                actor_lr = critic_lr = lr_cfg
            self.actor_lr_schedules[tag] = ParamScheduler(actor_lr)
            self.critic_lr_schedules[tag] = ParamScheduler(critic_lr)

            def make_opt(clip, max_norm):
                chain = []
                if clip:
                    chain.append(optax.clip_by_global_norm(max_norm))
                chain += [optax.scale_by_adam(), optax.scale(-1.0)]
                return optax.chain(*chain)

            clip = policy_cfg.get("clip_grad_norm", True)
            max_norm = policy_cfg.get("max_grad_norm", 3.0)
            self.actor_optimizers[tag] = make_opt(clip, max_norm)
            self.critic_optimizers[tag] = make_opt(clip, max_norm)

        self.params = {"actor": actor_params, "critic": critic_params}
        if self._is_eager:
            # eager CPU backend: replay state lives in self._eager_nets;
            # the rollout is python-stepped, the replay+update stays jitted
            self._eager_replay_update_fn = jax.jit(self._make_replay_update())
            init = self._init_carry()
            self._eager_nets = {
                k: init[k]
                for k in (
                    "actor", "critic", "target_actor", "target_critic",
                    "opt_actor", "opt_critic", "buf", "done_buf", "filled",
                )
            }
            self._eager_ou = {
                tag: np.zeros_like(np.asarray(init["ou"][tag]))
                for tag in self.policies
            }
        else:
            self._carry = self._maybe_shard_carry(self._init_carry())
            self._iteration_fn = jax.jit(
                self._build_iteration_fn(), donate_argnums=(0,)
            )
            # metrics-free hot twin for non-log iterations (see
            # _make_replay_update docstring); train() selects it
            self._iteration_fn_fast = jax.jit(
                self._build_iteration_fn(with_metrics=False),
                donate_argnums=(0,),
            )
        self._act_fn = jax.jit(
            self._build_act_fn(), static_argnames=("use_argmax",)
        )

        for tag in self.policies:
            ckpts = config["policy"][tag]["model"].get("model_ckpt_filepath", {})
            if isinstance(ckpts, dict) and any(ckpts.values()):
                self.load_model_checkpoint({tag: ckpts})

    # ------------------------------------------------------------- carries
    def _obs_feature_dim(self, tag):
        from warpdrive_tpu.utils.spaces import get_flattened_obs_size

        return get_flattened_obs_size(self.obs_space[tag])

    def _init_carry(self):
        E = self.num_envs
        cap = self.buffer_capacity
        buf = {}
        ou = {}
        # trainer.batch_dtype ("bfloat16") halves the replay window's obs
        # buffer — the dominant, longest-lived HBM consumer here (same
        # lever as the A2C rollout batch, docs/performance.md §8)
        bdt = jnp.dtype(self.config["trainer"].get("batch_dtype", "float32"))
        for tag, ids in self.policy_tag_to_agent_id_map.items():
            Ap = len(ids)
            C = self._num_action_dims[tag]
            F = self._obs_feature_dim(tag)
            buf[tag] = {
                "obs": jnp.zeros((cap, E, Ap, F), bdt),
                "actions": jnp.zeros((cap, E, Ap, C), jnp.float32),
                "rewards": jnp.zeros((cap, E, Ap), jnp.float32),
            }
            ou[tag] = jnp.zeros((E, Ap, C), jnp.float32)
        return {
            "env_state": self._rollout_env_state(),
            "actor": dict(self.params["actor"]),
            "critic": dict(self.params["critic"]),
            # hard-copied so target nets start equal to the online nets
            # (reference hard_update at init, ``trainer_ddpg.py:48-51``) but
            # occupy distinct buffers (the jitted iteration donates its carry).
            "target_actor": jax.tree_util.tree_map(
                jnp.copy, dict(self.params["actor"])
            ),
            "target_critic": jax.tree_util.tree_map(
                jnp.copy, dict(self.params["critic"])
            ),
            "opt_actor": {
                t: self.actor_optimizers[t].init(self.params["actor"][t])
                for t in self.policies
            },
            "opt_critic": {
                t: self.critic_optimizers[t].init(self.params["critic"][t])
                for t in self.policies
            },
            "ou": ou,
            "buf": buf,
            "done_buf": jnp.zeros((cap, E), jnp.int32),
            "filled": jnp.zeros((), jnp.int32),
            "rng": self._next_rng(),
            "ep_acc": jnp.zeros((E, self.engine.n_agents), jnp.float32),
            "ep_sum": jnp.zeros((), jnp.float32),
            "ep_count": jnp.zeros((), jnp.float32),
        }

    def _rebuild_carry_params(self, loaded=None):
        """Write freshly-loaded nets into the live carry / eager nets.

        ``loaded`` is a list of ``(net, policy)`` pairs; only those entries
        are touched (plus their targets, hard-reset to the loaded net in
        DISTINCT buffers — reference hard_update-at-load).  After the first
        jitted iteration, untouched ``self.params`` entries alias DONATED
        buffers; copying them wholesale would reinsert deleted arrays."""
        if loaded is None:
            loaded = [
                (net, tag)
                for net in ("actor", "critic")
                for tag in self.params[net]
            ]
        for net, tag in loaded:
            fresh = jax.tree_util.tree_map(
                jnp.asarray, self.params[net][tag]
            )
            if self._carry is not None and net in self._carry:
                self._carry[net][tag] = fresh
                self._carry[f"target_{net}"][tag] = jax.tree_util.tree_map(
                    jnp.copy, fresh
                )
            if getattr(self, "_eager_nets", None) is not None:
                # the eager CPU backend keeps its nets outside any carry;
                # without this a configured checkpoint was silently
                # discarded on the first eager iteration
                self._eager_nets[net][tag] = fresh
                self._eager_nets[f"target_{net}"][tag] = (
                    jax.tree_util.tree_map(jnp.copy, fresh)
                )

    # ------------------------------------------------------------- acting
    # _scatter_actions lives in TrainerBase; continuous action components
    _action_dtype = jnp.float32

    def _build_act_fn(self):
        """Deterministic (no-noise) action fn for evaluation."""

        def act(actor_params, env_state, key, use_argmax=True):
            del key
            per_policy = {}
            for tag in self.policies:
                obs_p, _ = self._policy_obs_and_mask(env_state, None, tag)
                per_policy[tag] = self.actor_models[tag].apply(
                    actor_params[tag], obs_p
                )
            if self.engine.separate_placeholders:
                return per_policy
            return self._scatter_actions(per_policy)

        return act

    # ------------------------------------------------------------- program
    def _make_rollout(self):
        """The OU-noise rollout scan as a standalone jittable: shared by the
        fused iteration program and the rollout-only profiling program
        (``TrainerBase.profile_phases``)."""
        engine = self.engine
        policies = list(self.policies)

        def rollout(actor_params, rollout_carry, step_keys, ou_noise,
                    damping, stddev, scale):
            def rollout_step(rs_carry, xs):
                key_t, noise_t = xs
                env_state, ou, ep_acc, ep_sum, ep_count = rs_carry
                _, k_reset = jax.random.split(key_t)

                obs_all = (
                    engine.observe(env_state)
                    if engine.has_split_step
                    else env_state[_OBS]
                )
                per_policy_actions = {}
                new_ou = {}
                rec = {}
                for tag in policies:
                    obs_p, _ = self._policy_obs_and_mask(
                        env_state, obs_all, tag
                    )
                    mu = self.actor_models[tag].apply(actor_params[tag], obs_p)
                    actions_p, new_ou[tag] = sample_ou_process(
                        None, mu, ou[tag],
                        damping=damping, stddev=stddev, scale=scale,
                        noise=noise_t[tag],
                    )
                    per_policy_actions[tag] = actions_p
                    rec[f"obs_{tag}"] = obs_p
                    rec[f"actions_{tag}"] = actions_p

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

                ep_acc = ep_acc + rewards
                done_mask = (done > 0).astype(jnp.float32)
                ep_sum = ep_sum + (ep_acc.mean(axis=1) * done_mask).sum()
                ep_count = ep_count + done_mask.sum()
                ep_acc = ep_acc * (1.0 - done_mask)[:, None]

                env_state = engine.auto_reset(env_state, k_reset)
                return (env_state, new_ou, ep_acc, ep_sum, ep_count), rec

            return jax.lax.scan(
                rollout_step, rollout_carry, (step_keys, ou_noise)
            )

        return rollout

    def _presample_ou_noise(self, carry, k_noise, stddev):
        """One (T, E, Ap, C) normal() draw per policy OUTSIDE the scan
        (TPU-first: keeps erf-inv lowering out of the compiled loop body)."""
        T = self.training_batch_size_per_env
        noise_keys = jax.random.split(k_noise, len(self.policies))
        return {
            tag: stddev
            * jax.random.normal(
                nk, (T,) + tuple(carry["ou"][tag].shape), dtype=jnp.float32
            )
            for nk, tag in zip(noise_keys, self.policies)
        }

    def _build_rollout_profile_fn(self):
        """(carry, rng) -> rollout outputs only; used for phase timing."""
        rollout = self._make_rollout()
        T = self.training_batch_size_per_env

        def run(carry, rng):
            k_roll, k_noise = jax.random.split(rng)
            step_keys = jax.random.split(k_roll, T)
            damping = self.ou_damping.value_at(0.0)
            stddev = self.ou_stddev.value_at(0.0)
            scale = self.ou_scale.value_at(0.0)
            ou_noise = self._presample_ou_noise(carry, k_noise, stddev)
            return rollout(
                carry["actor"],
                (
                    carry["env_state"],
                    carry["ou"],
                    carry["ep_acc"],
                    carry["ep_sum"],
                    carry["ep_count"],
                ),
                step_keys, ou_noise, damping, stddev, scale,
            )

        return run

    def _build_update_profile_fn(self):
        """(carry, rows, timestep, key) -> new carry; replay append + DDPG
        update only (direct timing for ``TrainerBase.profile_phases``)."""
        replay_update = self._make_replay_update(with_metrics=False)
        net_keys = (
            "actor", "critic", "target_actor", "target_critic",
            "opt_actor", "opt_critic", "buf", "done_buf", "filled",
        )

        def run(carry, rows, timestep, key):
            nets = {k: carry[k] for k in net_keys}
            new_nets, _ = replay_update(nets, rows, timestep)
            return {**carry, **new_nets}

        return run

    # _flat_apply (mesh-aware leading-dim collapse) lives in TrainerBase.

    def _make_replay_update(self, with_metrics=True):
        """Sliding-window replay append + per-policy DDPG update as a
        standalone jittable, shared by the fused iteration program and the
        eager CPU-backend path: ``replay_update(nets, rows, timestep) ->
        (new_nets, metrics)`` where ``nets`` holds actor/critic/targets/
        optimizer states and the replay buffers.

        ``with_metrics=False`` compiles the HOT form: plain ``jax.grad``
        with no aux outputs and an empty metrics dict (keeping loss/metric
        scalars as program outputs blocks XLA's forward-into-backward
        fusion — 2.25x measured on the A2C update, see
        ``TrainerA2C._make_update``). ``train()`` runs the hot program on
        every non-log iteration."""
        T = self.training_batch_size_per_env
        cap = self.buffer_capacity
        policies = list(self.policies)
        trained = list(self.policies_to_train)

        def replay_update(nets, rows, timestep):
            # ---- sliding-window replay update (RingBuffer parity) ----------
            new_buf = {}
            for tag in policies:
                b = nets["buf"][tag]
                new_buf[tag] = {
                    "obs": jnp.concatenate(
                        [
                            b["obs"][T:],
                            rows[f"obs_{tag}"].astype(b["obs"].dtype),
                        ],
                        axis=0,
                    ),
                    "actions": jnp.concatenate(
                        [b["actions"][T:], rows[f"actions_{tag}"]], axis=0
                    ),
                    "rewards": jnp.concatenate(
                        [b["rewards"][T:], rows[f"rewards_{tag}"]], axis=0
                    ),
                }
            done_buf = jnp.concatenate(
                [nets["done_buf"][T:], rows["done"]], axis=0
            )
            filled = jnp.minimum(nets["filled"] + T, cap)
            is_full = (filled >= cap).astype(jnp.float32)

            # ---- per-policy updates, gated on buffer fullness --------------
            new_actor = dict(nets["actor"])
            new_critic = dict(nets["critic"])
            new_t_actor = dict(nets["target_actor"])
            new_t_critic = dict(nets["target_critic"])
            new_opt_a = dict(nets["opt_actor"])
            new_opt_c = dict(nets["opt_critic"])
            all_metrics = {}

            for tag in trained:
                algo = self.algorithms[tag]
                actor_m = self.actor_models[tag]
                critic_m = self.critic_models[tag]
                obs_b = new_buf[tag]["obs"]
                act_b = new_buf[tag]["actions"]
                rew_b = new_buf[tag]["rewards"]

                # remat (policy.remat): recompute activations in backward
                # instead of storing them for the whole window batch
                if self.policy_remat.get(tag, False):
                    a_apply = self._flat_apply(jax.checkpoint(actor_m.apply))
                    c_apply = self._flat_apply(jax.checkpoint(critic_m.apply))
                else:
                    a_apply = self._flat_apply(actor_m.apply)
                    c_apply = self._flat_apply(critic_m.apply)
                ta_apply = self._flat_apply(actor_m.apply)
                tc_apply = self._flat_apply(critic_m.apply)

                # target next-Q: Q'(s_{t+1}, pi'(s_{t+1})), length cap-1
                # (reference ``trainer_ddpg.py:349-356``)
                t_mu = ta_apply(nets["target_actor"][tag], obs_b)
                next_q = tc_apply(
                    nets["target_critic"][tag], obs_b[1:], t_mu[1:]
                )
                next_q = jax.lax.stop_gradient(next_q)

                def critic_loss_fn(cp, obs_b=obs_b, act_b=act_b, rew_b=rew_b,
                                   next_q=next_q, c_apply=c_apply, algo=algo):
                    q = c_apply(cp, obs_b, act_b)
                    actor_loss, critic_loss, metrics = (
                        algo.compute_loss_and_metrics(
                            timestep, act_b, rew_b, done_buf,
                            q, next_q, q,
                        )
                    )
                    return critic_loss, metrics

                def actor_loss_fn(ap, cp, obs_b=obs_b,
                                  a_apply=a_apply, c_apply=c_apply,
                                  algo=algo):
                    mu = a_apply(ap, obs_b)
                    j = c_apply(cp, obs_b, mu)
                    valid = j.shape[0] - algo.n_step + 1
                    from warpdrive_tpu.algos.returns import (
                        normalize_across_env_agents,
                    )
                    norm_j = normalize_across_env_agents(
                        j[:valid], algo.normalize_return
                    )
                    # aux: the TRUE mean J = Q(s, pi(s)) for metrics (the
                    # critic-side aux computed it from Q(s, a_buffer))
                    return -norm_j.mean(), j[:valid].mean()

                if with_metrics:
                    c_grads, metrics = jax.grad(
                        critic_loss_fn, has_aux=True
                    )(nets["critic"][tag])
                    ((a_loss, mean_j), a_grads) = jax.value_and_grad(
                        actor_loss_fn, has_aux=True
                    )(
                        nets["actor"][tag],
                        jax.lax.stop_gradient(nets["critic"][tag]),
                    )
                    # the critic-side aux metrics computed "Actor loss"
                    # and "Mean J function" from Q(s, a_buffer); report
                    # the true values from the actor path Q(s, pi(s))
                    metrics["Actor loss"] = a_loss
                    metrics["Mean J function"] = mean_j
                    metrics["Total loss"] = a_loss + metrics["Critic loss"]
                else:
                    c_grads = jax.grad(
                        lambda cp: critic_loss_fn(cp)[0]
                    )(nets["critic"][tag])
                    a_grads = jax.grad(
                        lambda *a: actor_loss_fn(*a)[0]
                    )(
                        nets["actor"][tag],
                        jax.lax.stop_gradient(nets["critic"][tag]),
                    )
                    metrics = {}

                # Warm-up gating: while the replay window is not yet full,
                # the reference skips the update entirely
                # (``trainer_ddpg.py:319-334``).  Stepping the optimizer
                # with zeroed grads would still advance Adam's step count
                # and stale its bias correction, so the ENTIRE optimizer
                # state is selected back to the previous one when not full.
                full_b = is_full > 0.5
                sel = lambda new, old: jax.tree_util.tree_map(
                    lambda n, o: jnp.where(full_b, n, o), new, old
                )
                c_updates, opt_c_new = self.critic_optimizers[tag].update(
                    c_grads, nets["opt_critic"][tag], nets["critic"][tag]
                )
                a_updates, opt_a_new = self.actor_optimizers[tag].update(
                    a_grads, nets["opt_actor"][tag], nets["actor"][tag]
                )
                new_opt_c[tag] = sel(opt_c_new, nets["opt_critic"][tag])
                new_opt_a[tag] = sel(opt_a_new, nets["opt_actor"][tag])
                actor_lr = self.actor_lr_schedules[tag].value_at(timestep)
                critic_lr = self.critic_lr_schedules[tag].value_at(timestep)
                c_updates = jax.tree_util.tree_map(
                    lambda u: u * critic_lr * is_full, c_updates
                )
                a_updates = jax.tree_util.tree_map(
                    lambda u: u * actor_lr * is_full, a_updates
                )
                new_critic[tag] = optax.apply_updates(
                    nets["critic"][tag], c_updates
                )
                new_actor[tag] = optax.apply_updates(
                    nets["actor"][tag], a_updates
                )

                # soft target updates, also gated (reference :412-413)
                tau_eff = self.tau[tag] * is_full
                new_t_actor[tag] = soft_update(
                    nets["target_actor"][tag], new_actor[tag], tau_eff
                )
                new_t_critic[tag] = soft_update(
                    nets["target_critic"][tag], new_critic[tag], tau_eff
                )

                if with_metrics:
                    metrics["Current timestep"] = timestep
                    metrics["Actor learning rate"] = actor_lr
                    metrics["Critic learning rate"] = critic_lr
                    metrics["Actor gradient norm"] = optax.global_norm(
                        a_grads
                    )
                    metrics["Critic gradient norm"] = optax.global_norm(
                        c_grads
                    )
                    metrics["Buffer full"] = is_full
                    all_metrics[tag] = metrics


            new_nets = {
                "actor": new_actor,
                "critic": new_critic,
                "target_actor": new_t_actor,
                "target_critic": new_t_critic,
                "opt_actor": new_opt_a,
                "opt_critic": new_opt_c,
                "buf": new_buf,
                "done_buf": done_buf,
                "filled": filled,
            }
            return new_nets, all_metrics

        return replay_update

    def _build_iteration_fn(self, with_metrics=True):
        T = self.training_batch_size_per_env
        rollout = self._make_rollout()
        replay_update = self._make_replay_update(with_metrics=with_metrics)

        def iteration(carry, timestep):
            rng, k_roll, k_noise = jax.random.split(carry["rng"], 3)
            step_keys = jax.random.split(k_roll, T)

            damping = self.ou_damping.value_at(timestep)
            stddev = self.ou_stddev.value_at(timestep)
            scale = self.ou_scale.value_at(timestep)

            ou_noise = self._presample_ou_noise(carry, k_noise, stddev)

            (env_state, ou, ep_acc, ep_sum, ep_count), rows = rollout(
                carry["actor"],
                (
                    carry["env_state"],
                    carry["ou"],
                    carry["ep_acc"],
                    carry["ep_sum"],
                    carry["ep_count"],
                ),
                step_keys, ou_noise, damping, stddev, scale,
            )

            nets = {
                k: carry[k]
                for k in (
                    "actor", "critic", "target_actor", "target_critic",
                    "opt_actor", "opt_critic", "buf", "done_buf", "filled",
                )
            }
            new_nets, all_metrics = replay_update(nets, rows, timestep)

            mean_ep_reward = ep_sum / jnp.maximum(ep_count, 1.0)
            for tag in all_metrics:
                all_metrics[tag]["Mean episodic reward"] = mean_ep_reward

            new_carry = {
                "env_state": env_state,
                **new_nets,
                "ou": ou,
                "rng": rng,
                "ep_acc": ep_acc,
                "ep_sum": ep_sum,
                "ep_count": ep_count,
            }
            return new_carry, all_metrics

        return iteration

    # ------------------------------------------------------- checkpointing
    def _current_params(self, policy: str):
        if self._carry is not None and "actor" in self._carry:
            return {
                "actor": self._carry["actor"][policy],
                "critic": self._carry["critic"][policy],
            }
        return {
            "actor": self.params["actor"][policy],
            "critic": self.params["critic"][policy],
        }

    def save_model_checkpoint(self, timestep: int = None):
        """Save actor + critic per policy (reference ``:467-500``).

        As in ``TrainerBase``: the host pull may be a cross-process
        collective, so it runs on EVERY process; only the write is
        lead-gated (a lead-gated collective deadlocks the cluster).
        """
        from flax import serialization

        from warpdrive_tpu.parallel.mesh import to_host

        timestep = self.current_timestep if timestep is None else timestep
        for policy in self.policies_to_train:
            current = self._current_params(policy)
            for net in ("actor", "critic"):
                params_host = jax.tree_util.tree_map(to_host, current[net])
                if not self._is_lead_process():
                    continue
                payload = serialization.to_bytes(params_host)
                with open(self._ckpt_path(policy, timestep, net), "wb") as f:
                    f.write(payload)

    def load_model_checkpoint(self, ckpt_filepaths: dict):
        """
        Restore actor+critic per policy; asserts all files agree on the
        timestep (reference ``:501-532``).
        """
        import os

        from flax import serialization

        timesteps = set()
        loaded = []
        for policy, paths in ckpt_filepaths.items():
            if not isinstance(paths, dict):
                raise TypeError(
                    f"DDPG checkpoints are per-net: expected "
                    f"{{'actor': path, 'critic': path}} for {policy!r}, "
                    f"got {type(paths).__name__}"
                )
            for net in ("actor", "critic"):
                path = paths.get(net, "")
                if not path:
                    continue
                with open(path, "rb") as f:
                    payload = f.read()
                # template from the LIVE carry (the initial self.params
                # buffers are donated to the first jitted iteration, so a
                # mid-run reload must not dereference them)
                template = jax.device_get(self._current_params(policy)[net])
                self.params[net][policy] = serialization.from_bytes(
                    template, payload
                )
                loaded.append((net, policy))
                stem = os.path.basename(path).split(".")[0]
                timesteps.add(int(stem.split("_")[-1]))
        if timesteps:
            assert len(timesteps) == 1, "checkpoints disagree on the timestep"
            self.current_timestep = timesteps.pop()
        self._rebuild_carry_params(loaded)

    # ------------------------------------------------------- eager backend
    def _act_params(self):
        if self._carry is None and "actor" in self.params:
            return self.params["actor"]
        return super()._act_params()

    def _eager_iteration(self, timestep):
        """One DDPG iteration against an eager (CPU numpy-env) engine:
        python per-step rollout with OU exploration; the replay append and
        the actor/critic update run through the same jitted program as the
        fused path."""
        eng = self.engine
        T = self.training_batch_size_per_env
        damping = self.ou_damping.get_param_value(timestep)
        stddev = self.ou_stddev.get_param_value(timestep)
        scale = self.ou_scale.get_param_value(timestep)
        actor_params = self.params["actor"]
        recs = []
        for _ in range(T):
            st = eng.state
            per_policy = {}
            rec = {}
            for tag in self.policies:
                obs_p, _ = self._policy_obs_and_mask(st, None, tag)
                mu = self.actor_models[tag].apply(actor_params[tag], obs_p)
                noise = stddev * np.asarray(
                    jax.random.normal(self._next_rng(), mu.shape)
                )
                actions_p, new_ou = sample_ou_process(
                    None, mu, jnp.asarray(self._eager_ou[tag]),
                    damping=damping, stddev=stddev, scale=scale,
                    noise=jnp.asarray(noise),
                )
                self._eager_ou[tag] = np.asarray(new_ou)
                per_policy[tag] = actions_p
                rec[f"obs_{tag}"] = np.asarray(obs_p)
                rec[f"actions_{tag}"] = np.asarray(actions_p)
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

        rows = {k: np.stack([r[k] for r in recs]) for k in recs[0]}
        self._eager_nets, metrics = self._eager_replay_update_fn(
            dict(self._eager_nets), rows, jnp.asarray(timestep, jnp.float32)
        )
        self._eager_nets = dict(self._eager_nets)
        # keep self.params pointing at the live nets (acting + checkpoints)
        self.params = {
            "actor": dict(self._eager_nets["actor"]),
            "critic": dict(self._eager_nets["critic"]),
        }
        for tag in metrics:
            metrics[tag]["Mean episodic reward"] = jnp.asarray(
                self._eager_mean_ep_reward
            )
        return metrics

    # ------------------------------------------------------------ evaluate
    # evaluate_episodes lives in TrainerBase (done-masked, reference parity;
    # for DDPG ``use_argmax=True`` means noise-free deterministic actions).
