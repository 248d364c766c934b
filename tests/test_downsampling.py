"""Success-based env downsampling (reference ``a2c.py:58-69,196-218``:
done==2 marks success; negative envs are kept with probability
pos*ratio/neg)."""

import numpy as np

import jax
import jax.numpy as jnp

from warpdrive_tpu.algos.policygradient import env_selection_weights


def test_positives_always_kept_and_ratio_respected():
    T, E = 4, 1000
    done = np.zeros((T, E), dtype=np.int32)
    pos_envs = np.arange(0, 50)  # 50 successes
    done[2, pos_envs] = 2
    done[3, ::3] = 1  # plain terminations are NOT successes

    ratio = 4.0
    w = env_selection_weights(jnp.asarray(done), ratio, jax.random.PRNGKey(0))
    w = np.asarray(w)
    assert set(np.unique(w)) <= {0.0, 1.0}
    assert (w[pos_envs] == 1.0).all(), "positive envs must always be kept"

    neg_kept = w.sum() - len(pos_envs)
    expected = len(pos_envs) * ratio  # 200 of 950 negatives
    assert abs(neg_kept - expected) < 5 * np.sqrt(expected), (neg_kept, expected)


def test_no_positives_keeps_everything():
    done = jnp.ones((3, 64), jnp.int32)  # done==1 everywhere, no successes
    w = env_selection_weights(done, 5.0, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(w), 1.0)


def test_a2c_loss_with_downsampling_runs():
    from warpdrive_tpu.algos.policygradient import A2C

    T, E, A, C = 5, 8, 2, 3
    rng = np.random.RandomState(2)
    algo = A2C(discount_factor_gamma=0.9)
    done = np.zeros((T, E), np.int32)
    done[-1, :2] = 2
    loss, metrics = algo.compute_loss_and_metrics(
        jnp.asarray(0.0),
        jnp.asarray(rng.randint(0, C, (T, E, A, 1))),
        jnp.asarray(rng.randn(T, E, A).astype(np.float32)),
        jnp.asarray(done),
        [jnp.asarray(rng.randn(T, E, A, C).astype(np.float32))],
        jnp.asarray(rng.randn(T, E, A).astype(np.float32)),
        negative_positive_ratio=2.0,
        downsample_key=jax.random.PRNGKey(3),
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["Total loss"]))
