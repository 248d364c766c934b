"""
Return computations shared by the policy-gradient algorithms.

The reference computes discounted returns with a reverse python loop over the
time axis on GPU tensors (``a2c.py:80-93``, ``ddpg.py:57-80``); here the same
recurrences are ``lax.scan``s over time-major arrays, fully fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discounted_returns(
    rewards: jnp.ndarray,  # (T, E, A) float32
    done_flags: jnp.ndarray,  # (T, E) int32 (0 running / >0 done)
    values: jnp.ndarray,  # (T, E, A) float32 (already stop-gradient'ed)
    gamma: float,
) -> jnp.ndarray:
    """
    The reference A2C/PPO recursion (``a2c.py:80-93``), done-masked:

        R[T-1] = done[T-1] * r[T-1] + (1 - done[T-1]) * V[T-1]
        R[t]   = r[t] + (1 - done[t]) * gamma * R[t+1]

    Note the quirk preserved from the reference: when the last step is NOT
    done, the bootstrap replaces (rather than adds to) the last reward.
    """
    done = (done_flags > 0).astype(rewards.dtype)[..., None]  # (T, E, 1)
    last = done[-1] * rewards[-1] + (1.0 - done[-1]) * values[-1]

    def backward(carry, xs):
        rew_t, done_t = xs
        ret_t = rew_t + (1.0 - done_t) * gamma * carry
        return ret_t, ret_t

    _, rest = jax.lax.scan(
        backward, last, (rewards[:-1], done[:-1]), reverse=True
    )
    return jnp.concatenate([rest, last[None]], axis=0)


def n_step_returns(
    rewards: jnp.ndarray,  # (T, E, A)
    done_flags: jnp.ndarray,  # (T, E)
    next_values: jnp.ndarray,  # (T, E, A) detached Q(s', pi'(s'))
    gamma: float,
    n_step: int,
) -> jnp.ndarray:
    """
    n-step bootstrapped returns for DDPG (reference ``ddpg.py:57-80``),
    valid for the first ``T - n_step + 1`` time indices:

        last = i + n_step - 1
        r = rew[last] + (1 - done[last]) * gamma * V'[last]       (last < T-1)
        r = done[last]*rew[last] + (1-done[last])*V'[-1]          (last == T-1)
        for j in 1..n_step-1:
            r = rew[last-j] + (1 - done[last-j]) * gamma * r

    Returns shape (T - n_step + 1, E, A).
    """
    T = rewards.shape[0]
    valid = T - n_step + 1
    done = (done_flags > 0).astype(rewards.dtype)[..., None]

    def single(i):
        last = i + n_step - 1
        is_final = last == T - 1
        r_last = jnp.where(
            is_final,
            done[last] * rewards[last] + (1.0 - done[last]) * next_values[-1],
            rewards[last] + (1.0 - done[last]) * gamma * next_values[last],
        )

        def inner(j, r):
            idx = last - j
            return rewards[idx] + (1.0 - done[idx]) * gamma * r

        return jax.lax.fori_loop(1, n_step, inner, r_last)

    return jax.vmap(single)(jnp.arange(valid))


def normalize_across_env_agents(x: jnp.ndarray, enabled: bool, eps: float = 1e-10):
    """Normalize over the (env, agent) axes per timestep (``a2c.py:96-116``)."""
    if not enabled:
        return x
    mean = x.mean(axis=(1, 2), keepdims=True)
    std = x.std(axis=(1, 2), keepdims=True)
    return (x - mean) / (std + eps)
