"""Mixed-precision model option: bf16 compute with f32 params/outputs."""

import numpy as np

import jax
import jax.numpy as jnp

from warpdrive_tpu.models.fully_connected import FullyConnected


def test_bf16_compute_close_to_f32_and_f32_outputs():
    m32 = FullyConnected(fc_dims=(16, 16), output_dims=(3,))
    mbf = FullyConnected(fc_dims=(16, 16), output_dims=(3,), dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 2, 8).astype(np.float32))
    p = m32.init(jax.random.PRNGKey(0), x)

    h32, v32 = m32.apply(p, x)
    hbf, vbf = mbf.apply(p, x)

    # params stay f32 and outputs are cast back to f32
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree_util.tree_leaves(p)
    )
    assert hbf[0].dtype == jnp.float32 and vbf.dtype == jnp.float32

    err = float(jnp.abs(h32[0] - hbf[0]).max())
    assert err < 0.05, err
