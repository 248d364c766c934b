"""RingBuffer semantics (mirrors reference
``tests/warp_drive/numba_tests/test_ring_buffer.py:25-81``)."""

import numpy as np

import jax
import jax.numpy as jnp

from warpdrive_tpu.training.ring_buffer import RingBuffer, RingBufferManager


def test_ring_buffer_reference_sequence():
    rbm = RingBufferManager()
    rbm.add("X", capacity=5, item_shape=(3,))

    for i in (0, 1, 2):
        rbm.enqueue("X", jnp.full((3,), i, jnp.float32))
    buf, state = rbm.get("X")
    assert not bool(RingBuffer.isfull(state))
    res1 = np.asarray(rbm.unroll("X"))[: int(state.size)]
    assert res1.tolist() == [[0, 0, 0], [1, 1, 1], [2, 2, 2]]

    for i in (3, 4):
        rbm.enqueue("X", jnp.full((3,), i, jnp.float32))
    buf, state = rbm.get("X")
    assert bool(RingBuffer.isfull(state))
    res2 = np.asarray(rbm.unroll("X"))
    assert res2.tolist() == [[0, 0, 0], [1, 1, 1], [2, 2, 2], [3, 3, 3], [4, 4, 4]]

    for i in (5, 6, 7):
        rbm.enqueue("X", jnp.full((3,), i, jnp.float32))
    buf, state = rbm.get("X")
    assert bool(RingBuffer.isfull(state))
    res3 = np.asarray(rbm.unroll("X"))
    assert res3.tolist() == [[3, 3, 3], [4, 4, 4], [5, 5, 5], [6, 6, 6], [7, 7, 7]]


def test_ring_buffer_inside_jitted_scan():
    """The queue must be carryable through lax.scan (the DDPG use case)."""
    buf = RingBuffer(capacity=4, item_shape=(2,), dtype=jnp.float32)

    def body(state, x):
        state = buf.enqueue(state, x)
        return state, buf.unroll(state)

    xs = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    final, _ = jax.jit(lambda s, x: jax.lax.scan(body, s, x))(buf.init(), xs)
    # last 4 items in order: rows 2..5
    np.testing.assert_array_equal(
        np.asarray(buf.unroll(final)), np.asarray(xs[2:]), strict=False
    )
    assert bool(RingBuffer.isfull(final))
