"""
Functional on-device ring buffer.

Parity with reference ``warp_drive/training/utils/ring_buffer.py:5-87``
(``RingBuffer``/``RingBufferManager``): a fixed-capacity circular queue over
a device array, used by off-policy training to keep a rolling batch window.

The reference mutates a torch tensor in place and tracks ``front``/``rear``
host-side.  TPU-natively the queue is a VALUE: ``RingBufferState`` is a
pytree (storage, write cursor, size) and ``enqueue`` returns a new state via
``lax.dynamic_update_slice`` — usable both eagerly and inside jitted scans
(e.g. carried through a trainer iteration; ``TrainerDDPG`` uses the
specialized sliding-window form of the same idea).

Semantics match the reference exactly: enqueue drops the oldest entry once
full; ``unroll`` returns entries oldest -> newest.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RingBufferState(NamedTuple):
    """The queue value: preallocated storage + write cursor + fill count."""

    storage: jnp.ndarray  # (capacity, *item_shape)
    cursor: jnp.ndarray  # int32 scalar: next slot to write
    size: jnp.ndarray  # int32 scalar: current number of valid entries


class RingBuffer:
    """Fixed-capacity circular queue over ``(capacity, *item_shape)``."""

    def __init__(self, capacity: int, item_shape: tuple, dtype=jnp.float32):
        assert capacity > 0
        self.capacity = int(capacity)
        self.item_shape = tuple(item_shape)
        self.dtype = dtype

    def init(self) -> RingBufferState:
        return RingBufferState(
            storage=jnp.zeros((self.capacity,) + self.item_shape, self.dtype),
            cursor=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    def enqueue(self, state: RingBufferState, item: jnp.ndarray) -> RingBufferState:
        """Append ``item``; overwrites the oldest entry when full
        (reference ``ring_buffer.py:31-45``)."""
        item = jnp.asarray(item, self.dtype)[None]
        storage = jax.lax.dynamic_update_slice(
            state.storage, item, (state.cursor,) + (0,) * len(self.item_shape)
        )
        return RingBufferState(
            storage=storage,
            cursor=(state.cursor + 1) % self.capacity,
            size=jnp.minimum(state.size + 1, self.capacity),
        )

    def unroll(self, state: RingBufferState) -> jnp.ndarray:
        """
        Time-ordered view, oldest first (reference ``ring_buffer.py:58-67``).
        Always returns ``capacity`` rows for shape stability under jit; when
        the buffer is not yet full only the first ``size`` rows are valid
        (``isfull``/``size`` gate their use, exactly as the reference trains
        only on a full buffer).
        """
        front = jnp.where(
            state.size < self.capacity,
            jnp.zeros((), jnp.int32),
            state.cursor,
        )
        return jnp.roll(state.storage, -front, axis=0)

    @staticmethod
    def isfull(state: RingBufferState) -> jnp.ndarray:
        return state.size >= state.storage.shape[0]


class RingBufferManager(dict):
    """Name -> RingBuffer (+ state) registry (reference ``:75-87``)."""

    def add(self, name: str, capacity: int, item_shape: tuple, dtype=jnp.float32):
        buf = RingBuffer(capacity, item_shape, dtype)
        self[name] = (buf, buf.init())
        return buf

    def get(self, name: str):
        assert name in self, f"{name} not in the RingBufferManager"
        return self[name]

    def enqueue(self, name: str, item):
        buf, state = self.get(name)
        self[name] = (buf, buf.enqueue(state, item))

    def unroll(self, name: str):
        buf, state = self.get(name)
        return buf.unroll(state)

    def has(self, name: str) -> bool:
        return name in self
