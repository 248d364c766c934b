"""
A2C and PPO losses as pure JAX functions.

Functional parity with reference
``warp_drive/training/algorithms/policygradient/{a2c,ppo}.py``:

* discounted returns with done masking (``a2c.py:80-93``),
* optional return/advantage normalization over (env, agent) (``:96-116``),
* entropy and value-loss coefficient schedules (``:36-38,128-130``),
* PPO's single-epoch clipped surrogate with detached old log-probs
  (``ppo.py:120-136``),
* negative/positive env downsampling keyed on done==2 success markers
  (``a2c.py:196-218``) -- re-expressed as per-env Bernoulli keep-weights so it
  stays inside jit with static shapes (the reference gathers a dynamic subset
  of envs; expectation-equivalent, documented difference).

Batches are time-major: actions (T, E, A, C), rewards (T, E, A), dones (T, E),
logits a list of C arrays (T, E, A, n_c), values (T, E, A), where C is the
number of action components (1 for Discrete, len(nvec) for MultiDiscrete).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from warpdrive_tpu.algos.returns import discounted_returns, normalize_across_env_agents
from warpdrive_tpu.training.param_scheduler import ParamScheduler

_EPSILON = 1e-10


def env_selection_weights(
    done_flags_batch: jnp.ndarray,  # (T, E)
    negative_positive_ratio: float,
    key: jnp.ndarray,
) -> jnp.ndarray:
    """
    Per-env keep weights for success-based downsampling
    (reference ``a2c.py:196-218``): keep every env that hit done==2
    ("positive"), keep each other env with probability
    ``pos_count * ratio / neg_count``.  Returns (E,) float weights in {0, 1}.
    """
    E = done_flags_batch.shape[1]
    positives = (done_flags_batch == 2).any(axis=0)
    pos_count = positives.sum().astype(jnp.float32)
    neg_count = jnp.maximum(E - pos_count, 1.0)
    keep_prob = jnp.minimum(1.0, pos_count * negative_positive_ratio / neg_count)
    # no positives -> keep everything (reference: "do nothing")
    keep_prob = jnp.where(pos_count > 0, keep_prob, 1.0)
    bern = jax.random.uniform(key, (E,)) < keep_prob
    return (positives | bern).astype(jnp.float32)


def _wmean(x: jnp.ndarray, env_weights: jnp.ndarray) -> jnp.ndarray:
    """Mean over all elements, with per-env weights broadcast on axis 1."""
    w = env_weights.reshape((1, -1) + (1,) * (x.ndim - 2))
    denom = jnp.maximum(w.sum() * x.size / (x.shape[1]), _EPSILON)
    return (x * w).sum() / denom


def _logp_and_entropy(logits_list, actions):
    """Sum of per-component log-probs and mean entropy (``a2c.py:118-126``)."""
    log_prob = 0.0
    entropies = []
    for idx, logits in enumerate(logits_list):
        logp = jax.nn.log_softmax(logits, axis=-1)
        probs = jnp.exp(logp)
        entropies.append(-(probs * logp).sum(axis=-1))
        log_prob = log_prob + jnp.take_along_axis(
            logp, actions[..., idx][..., None].astype(jnp.int32), axis=-1
        )[..., 0]
    entropy = jnp.stack(entropies, axis=0)  # (C, T, E, A)
    return log_prob, entropy


class A2C:
    """Advantage Actor-Critic (reference ``a2c.py:18-194``)."""

    def __init__(
        self,
        discount_factor_gamma=1.0,
        normalize_advantage=False,
        normalize_return=False,
        vf_loss_coeff=0.01,
        entropy_coeff=0.01,
    ):
        assert 0 <= discount_factor_gamma <= 1
        self.discount_factor_gamma = float(discount_factor_gamma)
        self.normalize_advantage = bool(normalize_advantage)
        self.normalize_return = bool(normalize_return)
        self.vf_loss_coeff_schedule = ParamScheduler(vf_loss_coeff)
        self.entropy_coeff_schedule = ParamScheduler(entropy_coeff)

    # PPO overrides this hook
    def _policy_loss(self, log_prob, advantages, env_weights, old_log_prob=None):
        return _wmean(-log_prob * advantages, env_weights)

    def compute_loss_and_metrics(
        self,
        timestep,
        actions_batch,  # (T, E, A, C) int32
        rewards_batch,  # (T, E, A) float32
        done_flags_batch,  # (T, E) int32
        logits_batch,  # list of C arrays (T, E, A, n_c)
        value_functions_batch,  # (T, E, A) float32 (graph-connected)
        negative_positive_ratio: float = -1.0,
        downsample_key=None,
        old_log_prob=None,
    ):
        values_detached = jax.lax.stop_gradient(value_functions_batch)

        if negative_positive_ratio > 0:
            assert downsample_key is not None
            env_w = env_selection_weights(
                done_flags_batch, negative_positive_ratio, downsample_key
            )
        else:
            env_w = jnp.ones((rewards_batch.shape[1],), dtype=jnp.float32)

        returns = discounted_returns(
            rewards_batch, done_flags_batch, values_detached,
            self.discount_factor_gamma,
        )
        norm_returns = normalize_across_env_agents(returns, self.normalize_return)

        vf_loss = _wmean(
            (norm_returns - value_functions_batch) ** 2, env_w
        )

        advantages = norm_returns - values_detached
        norm_advantages = normalize_across_env_agents(
            advantages, self.normalize_advantage
        )

        log_prob, entropy = _logp_and_entropy(logits_batch, actions_batch)
        mean_entropy = sum(
            _wmean(entropy[c], env_w) for c in range(entropy.shape[0])
        )

        policy_loss = self._policy_loss(
            log_prob, norm_advantages, env_w, old_log_prob=old_log_prob
        )

        vf_coeff_t = self.vf_loss_coeff_schedule.value_at(timestep)
        ent_coeff_t = self.entropy_coeff_schedule.value_at(timestep)
        loss = policy_loss + vf_coeff_t * vf_loss - ent_coeff_t * mean_entropy

        variance_explained = jnp.maximum(
            -1.0,
            1.0
            - jax.lax.stop_gradient(norm_advantages).var()
            / (jax.lax.stop_gradient(norm_returns).var() + _EPSILON),
        )

        actions_f = actions_batch.astype(jnp.float32)
        metrics = {
            "VF loss coefficient": vf_coeff_t,
            "Entropy coefficient": ent_coeff_t,
            "Total loss": loss,
            "Policy loss": policy_loss,
            "Value function loss": vf_loss,
            "Mean rewards": rewards_batch.mean(),
            "Max. rewards": rewards_batch.max(),
            "Min. rewards": rewards_batch.min(),
            "Mean value function": value_functions_batch.mean(),
            "Mean advantages": advantages.mean(),
            "Mean (norm.) advantages": norm_advantages.mean(),
            "Mean (discounted) returns": returns.mean(),
            "Mean normalized returns": norm_returns.mean(),
            "Mean entropy": mean_entropy,
            "Variance explained by the value function": variance_explained,
            # action spread diagnostics (reference a2c.py:156-190)
            "Std. of action over agents": actions_f.std(axis=2).mean(),
            "Std. of action over envs": actions_f.std(axis=1).mean(),
            "Std. of action over time": actions_f.std(axis=0).mean(),
        }
        if negative_positive_ratio > 0:
            metrics["Num of Sampled Envs"] = env_w.sum()
        return loss, metrics


class PPO(A2C):
    """Single-epoch PPO with clipped surrogate (reference ``ppo.py:17-228``)."""

    def __init__(
        self,
        discount_factor_gamma=1.0,
        clip_param=0.1,
        normalize_advantage=False,
        normalize_return=False,
        vf_loss_coeff=0.01,
        entropy_coeff=0.01,
    ):
        super().__init__(
            discount_factor_gamma=discount_factor_gamma,
            normalize_advantage=normalize_advantage,
            normalize_return=normalize_return,
            vf_loss_coeff=vf_loss_coeff,
            entropy_coeff=entropy_coeff,
        )
        assert 0 <= clip_param <= 1
        self.clip_param = float(clip_param)

    def _policy_loss(self, log_prob, advantages, env_weights, old_log_prob=None):
        # Default: old_logprob = detached current log-prob (single-epoch
        # PPO, reference ppo.py:129-136): ratio == 1 in value, grads flow
        # through the unclipped branch only when within the clip band.
        # Multi-epoch PPO (beyond reference parity) passes the pre-update
        # rollout log-probs instead, making the clipped ratio meaningful.
        if old_log_prob is None:
            old_log_prob = jax.lax.stop_gradient(log_prob)
        ratio = jnp.exp(log_prob - old_log_prob)
        surr1 = ratio * advantages
        surr2 = (
            jnp.clip(ratio, 1.0 - self.clip_param, 1.0 + self.clip_param)
            * advantages
        )
        return _wmean(-jnp.minimum(surr1, surr2), env_weights)
