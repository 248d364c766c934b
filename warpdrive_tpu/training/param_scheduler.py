"""
Parameter schedules (learning rate, entropy/vf coefficients, sampler noise).

Parity with reference ``warp_drive/training/utils/param_scheduler.py:16-116``:
constant or piecewise-linear-in-timestep schedules.  Two evaluation paths:

* :meth:`ParamScheduler.get_param_value` -- host-side python float (logging,
  config plumbing);
* :meth:`ParamScheduler.value_at` -- traced jnp scalar usable INSIDE a jitted
  train step, so schedules update without retriggering compilation.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


class ParamScheduler:
    """Constant or piecewise-linear schedule over the global env timestep."""

    def __init__(self, schedule):
        if isinstance(schedule, (int, float)):
            self.type = "constant"
            self._times = None
            self._values = None
        elif isinstance(schedule, (list, tuple)):
            self.type = "piecewise_linear"
            for item in schedule:
                assert (
                    isinstance(item, (list, tuple)) and len(item) == 2
                ), "each schedule entry must be [timestep, value]"
            times = [float(t) for t, _ in schedule]
            assert times == sorted(times), "schedule times must be increasing"
            self._times = np.asarray(times, dtype=np.float64)
            self._values = np.asarray([v for _, v in schedule], dtype=np.float64)
        else:
            raise NotImplementedError(f"unsupported schedule {schedule!r}")
        self.schedule = schedule

    def get_param_value(self, timestep) -> float:
        """Host-side evaluation (clamped linear interpolation)."""
        assert timestep >= 0
        if self.type == "constant":
            return float(self.schedule)
        return float(np.interp(float(timestep), self._times, self._values))

    def value_at(self, timestep):
        """Traced evaluation for use inside jit."""
        if self.type == "constant":
            return jnp.asarray(self.schedule, dtype=jnp.float32)
        return jnp.interp(
            jnp.asarray(timestep, dtype=jnp.float32),
            jnp.asarray(self._times, dtype=jnp.float32),
            jnp.asarray(self._values, dtype=jnp.float32),
        )

    def make_optax_schedule(self, timesteps_per_iteration: int, init_timestep: int = 0):
        """
        An ``optax``-style schedule: iteration count -> value, mirroring the
        reference's ``LRScheduler`` LambdaLR wrapper
        (``param_scheduler.py:88-116``).
        """

        def schedule(count):
            t = init_timestep + count * timesteps_per_iteration
            return self.value_at(t)

        return schedule
