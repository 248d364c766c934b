"""
The environment-side contract for TPU-resident environments.

This is the TPU-native analog of the reference's ``CUDAEnvironmentContext``
(``warp_drive/utils/gpu_environment_context.py:17-45``).  Instead of holding a
compiled CUDA kernel handle plus a pointer feed, a TPU environment provides a
*pure JAX step function* over its single-replica state dict; the engine vmaps
it across replicas and the trainer fuses it into the jitted rollout scan.

An environment class is expected to subclass BOTH its numpy reference
implementation (gym-style ``reset()/step(actions_dict)``, used by the
consistency checker and the ``cpu`` backend -- cf. reference envs such as
``example_envs/tag_gridworld/tag_gridworld.py:22-317``) AND this context.
"""

from __future__ import annotations

from warpdrive_tpu.utils.data_feed import DataFeed


class TpuEnvironmentContext:
    """
    Mixin declaring the device-side state and step function of an env.

    Contract (mirrors reference ``gpu_environment_context.py:17-45``):

    * :meth:`get_data_dictionary` -- single-env state arrays (+ scalars) to
      place on device; called after the host-side ``reset()``.
    * :meth:`get_tensor_dictionary` -- extra placeholders (rarely needed).
    * :meth:`get_reset_pool_dictionary` -- banks of candidate reset values.
    * :meth:`step_fn` -- the pure step function for ONE env replica:
      ``step_fn(state: dict) -> dict`` where ``state`` maps array names to
      jnp arrays WITHOUT the env axis (the engine vmaps), including the
      built-ins ``_done_``/``_timestep_`` (scalars), ``_rng_`` (PRNG key),
      and the placeholders ``sampled_actions``/``observations``/``rewards``.
      It must return the full updated dict: increment ``_timestep_``, write
      ``observations``/``rewards``, and set ``_done_`` (0 running,
      1 terminated, 2 terminated-with-success, cf. reference
      ``mountain_car_step_numba.py:68-70``).
    """

    def get_data_dictionary(self) -> DataFeed:
        return DataFeed()

    def get_tensor_dictionary(self) -> DataFeed:
        return DataFeed()

    def get_reset_pool_dictionary(self) -> DataFeed:
        return DataFeed()

    def step_fn(self, state: dict) -> dict:  # pragma: no cover - abstract
        raise NotImplementedError

    # ------------------------------------------------------------------
    # Optional split-step fast path (TPU-first optimization, no reference
    # analog: the reference must materialize observations into its torch
    # -aliased placeholder every step because a separate process -- the
    # PyTorch policy -- reads them.  Here the policy lives in the same jitted
    # program, so observations can stay a DERIVED quantity: the rollout
    # carries only the small physical state, computes obs on the fly
    # (fused by XLA straight into the policy matmul), and never pays the
    # HBM round-trip of writing + reset-restoring a large obs array.)
    #
    # An env opts in by implementing BOTH:
    #
    # * ``physics_fn(state, actions) -> state`` -- the dynamics, rewards,
    #   done/timestep update for ONE replica, with actions passed as an
    #   argument instead of read from the ``sampled_actions`` placeholder,
    #   and WITHOUT writing ``observations``;
    # * ``observe_fn(state) -> obs`` -- the pure observation function of the
    #   current state (must satisfy ``step_fn == obs∘physics`` so the compat
    #   path and the consistency checker stay authoritative).
    #
    # ``has_split_step`` tells the engine/trainers the fast path exists.
    # ------------------------------------------------------------------

    @property
    def has_split_step(self) -> bool:
        return hasattr(self, "physics_fn") and hasattr(self, "observe_fn")
