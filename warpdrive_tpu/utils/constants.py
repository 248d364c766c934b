"""
Canonical array names used throughout the framework.

Capability parity with reference ``warp_drive/utils/constants.py:11-21``:
the same logical quantities exist (observations, sampled actions, rewards,
done flags, processed observations, action masks), plus the built-in
state names managed by the state store (reference
``managers/data_manager.py:75-105``).
"""


class Constants:
    """Canonical names for the arrays flowing through the RL loop."""

    OBSERVATIONS = "observations"
    PROCESSED_OBSERVATIONS = "processed_observations"
    ACTIONS = "sampled_actions"
    REWARDS = "rewards"
    DONE_FLAGS = "done_flags"
    ACTION_MASK = "action_mask"

    # Built-in per-env state entries (auto-created by the StateStore).
    DONE = "_done_"
    TIMESTEP = "_timestep_"
    RNG = "_rng_"


# Names that the StateStore owns and that env step functions may update.
BUILTIN_STATE_NAMES = (Constants.DONE, Constants.TIMESTEP, Constants.RNG)
