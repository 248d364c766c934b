"""Statistical sampler tests (parity with reference
``tests/warp_drive/numba_tests/test_action_sampler.py:43-257`` and
``test_ou_sampler.py:42-82``)."""

import numpy as np

import jax
import jax.numpy as jnp

from warpdrive_tpu.sampling.samplers import (
    ou_stationary_std,
    sample_categorical,
    sample_from_logits,
    sample_ou_process,
)


def test_categorical_matches_distribution():
    probs = jnp.asarray([0.1, 0.6, 0.3], dtype=jnp.float32)
    batch = jnp.broadcast_to(probs, (10000, 3))
    draws = sample_categorical(jax.random.PRNGKey(0), batch)
    freq = np.bincount(np.asarray(draws), minlength=3) / 10000.0
    np.testing.assert_allclose(freq, np.asarray(probs), atol=0.03)


def test_categorical_one_hot_rows():
    # degenerate rows always return the hot index (reference :120-145)
    probs = jnp.eye(5, dtype=jnp.float32)[jnp.asarray([3, 1, 4, 0, 2])]
    draws = sample_categorical(jax.random.PRNGKey(1), probs)
    np.testing.assert_array_equal(np.asarray(draws), [3, 1, 4, 0, 2])


def test_categorical_argmax_mode():
    probs = jnp.asarray([[0.2, 0.5, 0.3], [0.9, 0.05, 0.05]])
    draws = sample_categorical(jax.random.PRNGKey(2), probs, use_argmax=True)
    np.testing.assert_array_equal(np.asarray(draws), [1, 0])


def test_cross_env_randomness():
    # different envs draw independently (reference :200-257)
    probs = jnp.full((64, 10), 0.1, dtype=jnp.float32)
    draws = np.asarray(sample_categorical(jax.random.PRNGKey(3), probs))
    assert len(np.unique(draws)) > 3


def test_sample_from_logits_masked():
    logits = jnp.asarray([[0.0, -1e20, 0.0]])
    draws = np.asarray(
        jax.vmap(lambda k: sample_from_logits(k, logits))(
            jax.random.split(jax.random.PRNGKey(4), 200)
        )
    )
    assert (draws != 1).all()


def test_ou_process_stationary_moments():
    """Match the closed-form stationary std and lag autocovariance."""
    damping, stddev = 0.15, 0.5
    n_steps, n_chains = 4000, 256
    mu = jnp.zeros((n_chains,), dtype=jnp.float32)

    def body(carry, key):
        ou = carry
        action, ou = sample_ou_process(
            key, mu, ou, damping=damping, stddev=stddev, scale=1.0
        )
        return ou, action

    keys = jax.random.split(jax.random.PRNGKey(5), n_steps)
    _, actions = jax.lax.scan(body, jnp.zeros_like(mu), keys)
    tail = np.asarray(actions[1000:])  # discard burn-in

    expected_std = ou_stationary_std(damping, stddev)
    np.testing.assert_allclose(tail.std(), expected_std, rtol=0.05)

    # lag-10 autocovariance: var * (1-damping)^10 (reference test_ou_sampler)
    lag = 10
    autocov = np.mean(
        (tail[:-lag] - tail.mean()) * (tail[lag:] - tail.mean())
    )
    expected = expected_std**2 * (1 - damping) ** lag
    np.testing.assert_allclose(autocov, expected, rtol=0.2)


def test_ou_zero_scale_is_deterministic():
    mu = jnp.asarray([0.3, -0.7])
    ou0 = jnp.asarray([5.0, 5.0])
    action, ou = sample_ou_process(
        jax.random.PRNGKey(6), mu, ou0, scale=0.0
    )
    np.testing.assert_allclose(np.asarray(action), np.asarray(mu))
    np.testing.assert_allclose(np.asarray(ou), np.asarray(ou0))
