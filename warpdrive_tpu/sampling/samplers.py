"""
On-device action samplers.

TPU-native replacement for the reference's CUDA sampler stack
(``cuda_includes/core/random.cu:14-85``: per-thread curand states + per-agent
cumulative-distribution binary search, and
``numba_includes/core/random.py:74-105``: the Ornstein-Uhlenbeck sampler for
continuous actions).  Counter-based JAX RNG removes the mutable per-thread
state array entirely: a single key, split per step, drives every (env, agent)
draw, and ``jax.random.categorical`` performs the categorical draw via Gumbel
argmax -- a fully vectorized equivalent of the reference's inverse-CDF search.

Statistical contract (verified by ``tests/test_action_sampler.py``,
mirroring reference ``test_action_sampler.py:43-257``): empirical frequencies
match the supplied distribution, degenerate one-hot rows always return the hot
index, draws are independent across envs/agents, and the OU process matches
its closed-form stationary moments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TINY = 1e-30


def sample_categorical(
    key: jnp.ndarray,
    probs: jnp.ndarray,
    use_argmax: bool = False,
) -> jnp.ndarray:
    """
    Draw one action index per leading element of ``probs``.

    :param probs: (..., num_actions) nonnegative rows summing to ~1.
    :param use_argmax: deterministic mode (reference ``random.cu:58-69``).
    :returns: int32 array of shape ``probs.shape[:-1]``.
    """
    if use_argmax:
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)
    logits = jnp.log(probs + _TINY)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample_from_logits(
    key: jnp.ndarray,
    logits: jnp.ndarray,
    use_argmax: bool = False,
) -> jnp.ndarray:
    """Categorical draw directly from (masked) logits."""
    if use_argmax:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample_ou_process(
    key: jnp.ndarray,
    mu: jnp.ndarray,
    ou_state: jnp.ndarray,
    damping: float = 0.15,
    stddev: float = 0.2,
    scale: float = 1.0,
    noise: jnp.ndarray = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """
    One step of Ornstein-Uhlenbeck exploration noise around a deterministic
    policy output ``mu`` (reference ``numba_includes/core/random.py:74-105``):

        ou'    = (1 - damping) * ou + N(0, stddev)
        action = mu + scale * ou'

    With ``scale < eps`` the action is exactly ``mu`` and the noise state is
    untouched (the reference's no-noise eval mode).

    :param noise: optional presampled ``stddev * N(0, 1)`` draw shaped like
        ``mu``; when given, ``key`` is unused (rollout scans presample the
        whole iteration's noise in one batch and feed rows through the scan).
    :returns: (action, new_ou_state), both shaped like ``mu``.
    """
    scale = jnp.asarray(scale, dtype=mu.dtype)
    damping = jnp.asarray(damping, dtype=mu.dtype)
    stddev = jnp.asarray(stddev, dtype=mu.dtype)

    if noise is None:
        noise = stddev * jax.random.normal(key, mu.shape, dtype=mu.dtype)
    new_ou = (1.0 - damping) * ou_state + noise
    action = mu + scale * new_ou
    no_noise = scale < 1e-8
    return (
        jnp.where(no_noise, mu, action),
        jnp.where(no_noise, ou_state, new_ou),
    )


def ou_stationary_std(damping: float, stddev: float) -> float:
    """
    Closed-form stationary standard deviation of the OU recursion,
    ``stddev / sqrt(1 - (1 - damping)^2)`` (used by the statistical tests,
    cf. reference ``numba_tests/test_ou_sampler.py:42-82``).
    """
    import math

    return stddev / math.sqrt(1.0 - (1.0 - damping) ** 2)
