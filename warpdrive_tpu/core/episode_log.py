"""
Dense per-timestep episode logger.

Replaces the reference's CUDA log controller + kernels
(``cuda_includes/core/log.cu:11-62``, ``managers/function_manager.py:295-422``):
for one chosen env replica, record the full per-agent state of selected
arrays at every timestep of an episode into time-major ``(episode_length+1,
*single_env_shape)`` buffers, with a validity mask tracking which steps were
written.

TPU-natively this is a ``jax.lax.dynamic_update_slice`` into preallocated
buffers -- usable both eagerly (one call per step, like the reference) and
inside a jitted ``lax.scan`` rollout.
"""

from __future__ import annotations

import jax.numpy as jnp

from warpdrive_tpu.utils.constants import Constants


class EpisodeLogger:
    """Functional episode logger over a StateStore's log-flagged arrays."""

    def __init__(self, store):
        self._store = store
        self.episode_length = store.episode_length
        self.log_names = list(store.log_names)

    def init_buffers(self, state: dict, env_id: int = 0) -> dict:
        """
        Allocate log buffers and record timestep-0 values
        (reference ``reset_log`` + ``log_one_step_in_*`` at t=0,
        ``function_manager.py:324-352``).
        """
        buffers = {}
        for name in self.log_names:
            single = state[name][env_id]
            buf = jnp.zeros(
                (self.episode_length + 1,) + single.shape, dtype=single.dtype
            )
            buffers[name] = buf.at[0].set(single)
        buffers["_log_mask_"] = (
            jnp.zeros((self.episode_length + 1,), dtype=jnp.int32).at[0].set(1)
        )
        return buffers

    def log_step(self, buffers: dict, state: dict, t, env_id: int = 0) -> dict:
        """
        Record the state of env ``env_id`` at timestep ``t`` (a traced or
        python int).  The reference asserts the previous step was logged
        (``log.cu:20-29``); here the mask makes that check a pure-data
        property verified by :meth:`verify_mask`.
        """
        new_buffers = dict(buffers)
        for name in self.log_names:
            new_buffers[name] = buffers[name].at[t].set(state[name][env_id])
        new_buffers["_log_mask_"] = buffers["_log_mask_"].at[t].set(1)
        return new_buffers

    @staticmethod
    def verify_mask(buffers: dict, last_step: int) -> bool:
        """Check steps ``0..last_step`` were all logged contiguously."""
        mask = buffers["_log_mask_"]
        import numpy as np

        mask = np.asarray(mask)
        return bool(mask[: last_step + 1].all()) and not bool(
            mask[last_step + 1 :].any()
        )

    def fetch(self, buffers: dict, last_step: int) -> dict:
        """Pull logged trajectories ``0..last_step`` to host."""
        import numpy as np

        assert self.verify_mask(buffers, last_step), "log mask is not contiguous"
        return {
            name: np.asarray(buffers[name][: last_step + 1])
            for name in self.log_names
        }
