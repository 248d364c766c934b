"""
Observation / action / reward placeholder creation.

Parity with reference ``warp_drive/training/utils/data_loader.py:30-709``
(``create_and_push_data_placeholders``), re-architected for the TPU engine:
instead of allocating torch-aliased device buffers, these helpers stack the
env's first-reset per-agent observations into named arrays on the engine's
:class:`StateStore` — the same arrays the env's pure ``step_fn`` writes and
the jitted trainers read.

Supported modes (naming identical to the reference):

* shared placeholders (default): one ``observations`` array (Box obs) or one
  ``observations_<key>`` array per Dict-obs key, plus ``sampled_actions`` and
  ``rewards`` covering all agents — requires every agent to share obs/action
  space shapes (validated, cf. reference ``:269-308``).
* separate per-policy placeholders
  (``create_separate_placeholders_for_each_policy=True``): per policy ``p``,
  ``observations_<p>`` / ``observations_<p>_<key>``, ``sampled_actions_<p>``
  and ``rewards_<p>`` — this is how heterogeneous obs/action spaces across
  policies are supported (reference ``:145-209``).
* ``obs_dim_corresponding_to_num_agents``: "first" stores obs
  ``(envs, agents, *feat)``; "last" stores ``(envs, *feat, agents)`` for envs
  whose step functions naturally write agent-dim-last layouts (reference
  ``get_obs``, ``:681-690``; models permute back, ``model_base.py:105-131``).
"""

from __future__ import annotations

import numpy as np

from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.data_feed import DataFeed
from warpdrive_tpu.utils.spaces import Box, Discrete, MultiDiscrete

_OBS = Constants.OBSERVATIONS
_ACTIONS = Constants.ACTIONS
_REWARDS = Constants.REWARDS
# (action masks ride as a Dict-obs key — see trainer_base._policy_obs_and_mask)


def all_equal(iterable) -> bool:
    items = list(iterable)
    return all(x == items[0] for x in items[1:])


def _shape_of(v):
    """Shape of a space-like or array-like dict value (``np.asarray`` on a
    Space object is a 0-d object array whose shape compares vacuously)."""
    shp = getattr(v, "shape", None)
    return tuple(shp) if shp is not None else np.asarray(v).shape


def validate_obs_action_spaces(agent_ids, observation_space, action_space):
    """
    Assert all agents in one placeholder group share obs/action space types
    and shapes (reference ``data_loader.py:269-308``).
    """
    obs_spaces = [observation_space[aid] for aid in agent_ids]
    first = obs_spaces[0]
    assert all_equal(type(s) for s in obs_spaces)
    if isinstance(first, dict):
        assert all_equal(tuple(s.keys()) for s in obs_spaces)
        assert all_equal(
            tuple(_shape_of(v) for v in s.values()) for s in obs_spaces
        )
    elif isinstance(first, Box):
        assert all_equal(s.shape for s in obs_spaces)
    else:
        # DictSpace
        from warpdrive_tpu.utils.spaces import DictSpace

        assert isinstance(first, DictSpace), (
            "observation spaces must be Box or DictSpace, got "
            f"{type(first).__name__}"
        )
        assert all_equal(tuple(s.keys()) for s in obs_spaces)
        assert all_equal(
            tuple(sub.shape for sub in s.values()) for s in obs_spaces
        )

    act_spaces = [action_space[aid] for aid in agent_ids]
    first_a = act_spaces[0]
    assert all_equal(type(s) for s in act_spaces)
    if isinstance(first_a, MultiDiscrete):
        assert all_equal(tuple(s.nvec) for s in act_spaces)
    elif isinstance(first_a, Discrete):
        assert all_equal(s.n for s in act_spaces)
    elif isinstance(first_a, Box):
        assert all_equal(s.shape for s in act_spaces)
    else:
        raise NotImplementedError(repr(first_a))


def get_obs_group(
    obs: dict, agent_ids, obs_dim_corresponding_to_num_agents="first",
    obs_key=None,
) -> np.ndarray:
    """
    Stack one group's per-agent observations (reference ``get_obs``,
    ``data_loader.py:681-690``): "first" -> (agents, *feat); "last" ->
    (feat, agents) via a swap of the first and last axes.

    "last" mode is restricted to 1-D per-agent features: for >=2-D features
    the reference's own swapaxes stacking, its model-side permute, and the
    env kernel's natural write order disagree on feature-axis order (a
    latent upstream quirk); rather than silently transposing features, we
    reject the combination.
    """
    if obs_key is not None:
        stacked = np.asarray([np.asarray(obs[aid][obs_key]) for aid in agent_ids])
    else:
        stacked = np.asarray([np.asarray(obs[aid]) for aid in agent_ids])
    if obs_dim_corresponding_to_num_agents == "last":
        # the swap applies to single-agent groups too: an agent-dim-last
        # env writes its natural (feat, agents) layout even when a group
        # has one agent, so the placeholder must be (feat, 1), not (1, feat)
        assert stacked.ndim <= 2, (
            "obs_dim_corresponding_to_num_agents='last' supports 1-D "
            f"per-agent features only (got feature shape "
            f"{stacked.shape[1:]}); store multi-dim features agent-dim-"
            "first, or flatten them in the env"
        )
        return np.swapaxes(stacked, 0, -1)
    return stacked


def _action_spec(space):
    """(num_action_types, dtype) of an action space."""
    if isinstance(space, Discrete):
        return 1, np.int32
    if isinstance(space, MultiDiscrete):
        return len(space.nvec), np.int32
    if isinstance(space, Box):
        assert len(space.shape) == 1, (
            f"continuous action spaces must be 1-D, got shape {space.shape} "
            "(flatten multi-dimensional actions in the env)"
        )
        return int(space.shape[0]), np.float32
    raise NotImplementedError(repr(space))


def create_and_push_data_placeholders(
    store,
    obs: dict,
    observation_space: dict,
    action_space: dict,
    policy_tag_to_agent_id_map: dict = None,
    create_separate_placeholders_for_each_policy: bool = False,
    obs_dim_corresponding_to_num_agents: str = "first",
) -> dict:
    """
    Create and push observation/action/reward placeholders into ``store``
    (reference ``data_loader.py:30-267``).

    :param store: the engine's StateStore.
    :param obs: first-reset per-agent observation dict ``{agent_id: array |
        {key: array}}``.
    :returns: metadata ``{"separate": bool, "obs_dim": str, "groups":
        {tag_or_None: {"mode": "box"|"dict", "keys": [...],
        "action": (num_components, dtype)}}}`` — per-group obs modes,
        because in separate mode each policy may have a DIFFERENT obs
        structure (one policy Box, another Dict).
    """
    assert obs_dim_corresponding_to_num_agents in ("first", "last")
    agent_ids_all = sorted(obs.keys())
    meta = {
        "separate": bool(create_separate_placeholders_for_each_policy),
        "obs_dim": obs_dim_corresponding_to_num_agents,
        "groups": {},
    }

    def push_group(agent_ids, suffix: str) -> dict:
        first_obs = obs[agent_ids[0]]
        mode = "dict" if isinstance(first_obs, dict) else "box"
        keys = list(first_obs.keys()) if mode == "dict" else []
        feed = DataFeed()
        if mode == "box":
            stacked = get_obs_group(
                obs, agent_ids, obs_dim_corresponding_to_num_agents
            ).astype(np.float32)
            feed.add_data(
                name=_OBS + suffix, data=stacked,
                save_copy_and_apply_at_reset=True,
            )
        else:
            for key in keys:
                stacked = get_obs_group(
                    obs, agent_ids, obs_dim_corresponding_to_num_agents,
                    obs_key=key,
                ).astype(np.float32)
                feed.add_data(
                    name=f"{_OBS}{suffix}_{key}", data=stacked,
                    save_copy_and_apply_at_reset=True,
                )
        # rewards placeholder (reference :607-623)
        feed.add_data(
            name=_REWARDS + suffix,
            data=np.zeros((len(agent_ids),), dtype=np.float32),
        )
        # sampled-actions placeholder (reference :420-509)
        num_c, act_dtype = _action_spec(action_space[agent_ids[0]])
        feed.add_data(
            name=_ACTIONS + suffix,
            data=np.zeros((len(agent_ids), num_c), dtype=act_dtype),
        )
        store.push(feed)
        return {"mode": mode, "keys": keys, "action": (num_c, act_dtype)}

    if create_separate_placeholders_for_each_policy:
        assert policy_tag_to_agent_id_map is not None and (
            len(policy_tag_to_agent_id_map) > 1
        ), (
            "separate placeholders require multiple policies "
            "(reference data_loader.py:150-153)"
        )
        for tag, agent_ids in policy_tag_to_agent_id_map.items():
            agent_ids = sorted(int(i) for i in agent_ids)
            if len(agent_ids) > 1:
                validate_obs_action_spaces(
                    agent_ids, observation_space, action_space
                )
            meta["groups"][tag] = push_group(agent_ids, f"_{tag}")
    else:
        if len(agent_ids_all) > 1:
            validate_obs_action_spaces(
                agent_ids_all, observation_space, action_space
            )
        meta["groups"][None] = push_group(agent_ids_all, "")
    return meta
