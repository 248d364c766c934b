"""
DDPG loss as pure JAX functions.

Parity with reference
``warp_drive/training/algorithms/policygradient/ddpg.py:18-177``: n-step
bootstrapped returns against the target critic, a critic MSE loss and an
actor loss ``-mean(Q(s, pi(s)))``, each restricted to the first
``T - n_step + 1`` batch rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from warpdrive_tpu.algos.returns import n_step_returns, normalize_across_env_agents

_EPSILON = 1e-10


class DDPG:
    """Deep Deterministic Policy Gradient (losses only; nets live in the trainer)."""

    def __init__(
        self,
        discount_factor_gamma=1.0,
        normalize_advantage=False,
        normalize_return=False,
        n_step=1,
    ):
        assert 0 <= discount_factor_gamma <= 1 and n_step >= 1
        self.discount_factor_gamma = float(discount_factor_gamma)
        self.normalize_advantage = bool(normalize_advantage)
        self.normalize_return = bool(normalize_return)
        self.n_step = int(n_step)

    def compute_loss_and_metrics(
        self,
        timestep,
        actions_batch,  # (T, E, A, C) float32
        rewards_batch,  # (T, E, A)
        done_flags_batch,  # (T, E)
        value_functions_batch,  # (T, E, A) Q(s, a) -- critic graph
        next_value_functions_batch,  # (T, E, A) target Q(s', pi'(s')) -- detached
        j_functions_batch,  # (T, E, A) Q(s, pi(s)) -- actor graph
    ):
        next_v_detached = jax.lax.stop_gradient(next_value_functions_batch)
        valid = rewards_batch.shape[0] - self.n_step + 1

        returns = n_step_returns(
            rewards_batch,
            done_flags_batch,
            next_v_detached,
            self.discount_factor_gamma,
            self.n_step,
        )
        norm_returns = normalize_across_env_agents(returns, self.normalize_return)

        values = value_functions_batch[:valid]
        critic_loss = ((norm_returns - values) ** 2).mean()

        advantages = norm_returns - values
        norm_advantages = normalize_across_env_agents(
            advantages, self.normalize_advantage
        )

        j = j_functions_batch[:valid]
        norm_j = normalize_across_env_agents(j, self.normalize_return)
        actor_loss = -norm_j.mean()

        variance_explained = jnp.maximum(
            -1.0,
            1.0
            - jax.lax.stop_gradient(norm_advantages).var()
            / (jax.lax.stop_gradient(norm_returns).var() + _EPSILON),
        )

        actions_f = actions_batch.astype(jnp.float32)
        metrics = {
            "Total loss": actor_loss + critic_loss,
            "Actor loss": actor_loss,
            "Critic loss": critic_loss,
            "Mean rewards": rewards_batch.mean(),
            "Max. rewards": rewards_batch.max(),
            "Min. rewards": rewards_batch.min(),
            "Mean value function": values.mean(),
            "Mean J function": j.mean(),
            "Mean advantages": advantages.mean(),
            "Mean (norm.) advantages": norm_advantages.mean(),
            "Mean (discounted) returns": returns.mean(),
            "Mean normalized returns": norm_returns.mean(),
            "Variance explained by the value function": variance_explained,
            "Std. of action over agents": actions_f.std(axis=2).mean(),
            "Std. of action over envs": actions_f.std(axis=1).mean(),
            "Std. of action over time": actions_f.std(axis=0).mean(),
            "Max of action": actions_f.max(),
            "Min of action": actions_f.min(),
        }
        return actor_loss, critic_loss, metrics
