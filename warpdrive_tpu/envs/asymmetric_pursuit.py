"""
AsymmetricPursuit: a two-policy pursuit env with HETEROGENEOUS observation
spaces — the framework's demonstration of separate per-policy placeholders
and Dict observations (incl. an ``action_mask`` obs key).

Capability target: the reference supports per-policy placeholders
(``warp_drive/training/utils/data_loader.py:145-209``) and Dict obs with an
``action_mask`` key (``model_base.py:133-186``), but ships no in-tree example
env exercising them; this env closes that gap for tests and tutorials.

Game rules (fully deterministic given actions):

* ``num_pursuers`` pursuers (policy "pursuer", agent ids first) and
  ``num_evaders`` evaders (policy "evader") move on a continuous square
  ``[0, grid_length]^2`` with 5 discrete actions (stay/+x/-x/+y/-y),
  positions clipped to the square;
* pursuer reward: +``catch_reward`` per evader within ``catch_radius`` of
  it this step, minus ``step_cost``; evader reward: -``catch_reward`` when
  any pursuer is within ``catch_radius`` of it, else +``survive_bonus``;
* episode ends at ``episode_length`` (time-limit done).

Observation spaces (deliberately different per policy):

* pursuer: Box(5) ``[x/L, y/L, (mean_evader_x - x)/L, (mean_evader_y - y)/L,
  t/T]``;
* evader: Dict with ``self`` Box(2), ``nearest_pursuer`` Box(2) (relative,
  normalized) and ``action_mask`` Box(5) — 1 for moves that stay on the
  grid (stay is always legal).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from warpdrive_tpu.envs.base import TpuEnvironmentContext
from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.data_feed import DataFeed
from warpdrive_tpu.utils.env_registrar import env_registrar
from warpdrive_tpu.utils.spaces import Box, DictSpace, Discrete

_OBS = Constants.OBSERVATIONS
_ACTIONS = Constants.ACTIONS
_REWARDS = Constants.REWARDS

# (dx, dy) per discrete action: stay, +x, -x, +y, -y
MOVES = np.array(
    [[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]],
    dtype=np.float32,
)


class AsymmetricPursuit:
    """Numpy reference implementation (gym-style per-agent dict API)."""

    name = "AsymmetricPursuit"

    def __init__(
        self,
        num_pursuers=2,
        num_evaders=3,
        grid_length=10.0,
        catch_radius=1.0,
        episode_length=50,
        pursuer_step=1.0,
        evader_step=1.0,
        catch_reward=1.0,
        step_cost=0.01,
        survive_bonus=0.01,
        seed=None,
        env_backend="cpu",
    ):
        assert num_pursuers > 0 and num_evaders > 0 and episode_length > 0
        self.num_pursuers = int(num_pursuers)
        self.num_evaders = int(num_evaders)
        self.num_agents = self.num_pursuers + self.num_evaders
        self.grid_length = float(grid_length)
        self.catch_radius = float(catch_radius)
        self.episode_length = int(episode_length)
        self.pursuer_step = float(pursuer_step)
        self.evader_step = float(evader_step)
        self.catch_reward = float(catch_reward)
        self.step_cost = float(step_cost)
        self.survive_bonus = float(survive_bonus)
        self.np_random = np.random.RandomState(seed)
        self.env_backend = env_backend

        # pursuers first, evaders after (agent_type 0 = pursuer, 1 = evader)
        self.agent_type = {
            aid: (0 if aid < self.num_pursuers else 1)
            for aid in range(self.num_agents)
        }

        self.action_space = {
            aid: Discrete(len(MOVES)) for aid in range(self.num_agents)
        }
        self.observation_space = {}
        for aid in range(self.num_agents):
            if self.agent_type[aid] == 0:
                self.observation_space[aid] = Box(-1.0, 1.0, shape=(5,))
            else:
                self.observation_space[aid] = DictSpace(
                    {
                        "self": Box(0.0, 1.0, shape=(2,)),
                        "nearest_pursuer": Box(-1.0, 1.0, shape=(2,)),
                        Constants.ACTION_MASK: Box(0.0, 1.0, shape=(5,)),
                    }
                )

        # deterministic starting layout: pursuers on one diagonal band,
        # evaders spread on the opposite side
        P, E, L = self.num_pursuers, self.num_evaders, self.grid_length
        start = np.zeros((self.num_agents, 2), dtype=np.float32)
        for i in range(P):
            frac = (i + 1) / (P + 1)
            start[i] = (frac * L, 0.25 * L)
        for j in range(E):
            frac = (j + 1) / (E + 1)
            start[P + j] = (frac * L, 0.75 * L)
        self.starting_loc = start
        self.loc = None
        self.timestep = None

    # ----------------------------------------------------------- numpy path
    def _step_sizes(self) -> np.ndarray:
        sizes = np.full(self.num_agents, self.evader_step, dtype=np.float32)
        sizes[: self.num_pursuers] = self.pursuer_step
        return sizes

    def _action_mask_for(self, loc_xy: np.ndarray, step: float) -> np.ndarray:
        """Legal-move mask: 1 when the move keeps the agent inside the grid."""
        mask = np.ones(len(MOVES), dtype=np.float32)
        for a, (dx, dy) in enumerate(MOVES):
            nx = loc_xy[0] + dx * step
            ny = loc_xy[1] + dy * step
            if not (0.0 <= nx <= self.grid_length and 0.0 <= ny <= self.grid_length):
                mask[a] = 0.0
        return mask

    def _generate_observation(self) -> dict:
        P, L = self.num_pursuers, self.grid_length
        t_norm = np.float32(self.timestep / self.episode_length)
        loc = self.loc
        mean_evader = loc[P:].mean(axis=0)
        obs = {}
        for i in range(P):
            obs[i] = np.array(
                [
                    loc[i, 0] / L,
                    loc[i, 1] / L,
                    (mean_evader[0] - loc[i, 0]) / L,
                    (mean_evader[1] - loc[i, 1]) / L,
                    t_norm,
                ],
                dtype=np.float32,
            )
        for j in range(P, self.num_agents):
            d2 = ((loc[:P] - loc[j]) ** 2).sum(axis=1)
            nearest = int(np.argmin(d2))
            obs[j] = {
                "self": (loc[j] / L).astype(np.float32),
                "nearest_pursuer": ((loc[nearest] - loc[j]) / L).astype(
                    np.float32
                ),
                Constants.ACTION_MASK: self._action_mask_for(
                    loc[j], self.evader_step
                ),
            }
        return obs

    def reset(self):
        self.timestep = 0
        self.loc = self.starting_loc.copy()
        return self._generate_observation()

    def step(self, actions=None):
        assert isinstance(actions, dict) and len(actions) == self.num_agents
        self.timestep += 1
        act = np.array(
            [
                int(np.asarray(actions[a]).reshape(-1)[0])
                for a in range(self.num_agents)
            ],
            dtype=np.int32,
        )
        deltas = MOVES[act] * self._step_sizes()[:, None]
        self.loc = np.clip(self.loc + deltas, 0.0, self.grid_length)

        P = self.num_pursuers
        # pairwise pursuer-evader distances (P, E)
        diff = self.loc[:P, None, :] - self.loc[None, P:, :]
        dist = np.sqrt((diff**2).sum(axis=-1))
        within = dist <= self.catch_radius

        reward = np.zeros(self.num_agents, dtype=np.float32)
        reward[:P] = self.catch_reward * within.sum(axis=1) - self.step_cost
        caught = within.any(axis=0)
        reward[P:] = np.where(
            caught, -self.catch_reward, self.survive_bonus
        ).astype(np.float32)

        obs = self._generate_observation()
        rew = {aid: float(reward[aid]) for aid in range(self.num_agents)}
        done = {"__all__": self.timestep >= self.episode_length}
        return obs, rew, done, {}


class TpuAsymmetricPursuit(AsymmetricPursuit, TpuEnvironmentContext):
    """
    TPU implementation writing SEPARATE per-policy placeholders:
    ``observations_pursuer`` (Box), ``observations_evader_<key>`` (Dict),
    ``sampled_actions_{pursuer,evader}`` and ``rewards_{pursuer,evader}``.
    Use with ``EnvEngine(..., policy_tag_to_agent_id_map={"pursuer": [...],
    "evader": [...]}, create_separate_placeholders_for_each_policy=True)``.
    """

    def policy_map(self) -> dict:
        P = self.num_pursuers
        return {
            "pursuer": list(range(P)),
            "evader": list(range(P, self.num_agents)),
        }

    def get_data_dictionary(self) -> DataFeed:
        data = DataFeed()
        assert self.loc is not None, "call reset() before building the feed"
        data.add_data(
            "loc", self.loc, save_copy_and_apply_at_reset=True,
            log_data_across_episode=True,
        )
        return data

    def step_fn(self, state: dict) -> dict:
        P, E = self.num_pursuers, self.num_evaders
        L = self.grid_length
        t = state[Constants.TIMESTEP] + 1
        moves = jnp.asarray(MOVES)  # (5, 2)

        a_p = state[f"{_ACTIONS}_pursuer"][:, 0]  # (P,) int32
        a_e = state[f"{_ACTIONS}_evader"][:, 0]  # (E,) int32
        # one-hot contraction instead of a data-dependent gather
        # (TPU lowers moves[a] serially; docs/performance.md). NOTE:
        # eye(...)[a] is itself a gather — build the one-hot with a
        # comparison broadcast (round 4)
        rng5 = jnp.arange(len(MOVES), dtype=a_p.dtype)
        d_p = jnp.einsum(
            "pa,ac->pc", (a_p[:, None] == rng5).astype(moves.dtype), moves
        ) * self.pursuer_step
        d_e = jnp.einsum(
            "ea,ac->ec", (a_e[:, None] == rng5).astype(moves.dtype), moves
        ) * self.evader_step
        loc = state["loc"]
        loc = jnp.clip(
            loc + jnp.concatenate([d_p, d_e], axis=0), 0.0, L
        ).astype(jnp.float32)

        loc_p, loc_e = loc[:P], loc[P:]
        diff = loc_p[:, None, :] - loc_e[None, :, :]  # (P, E, 2)
        dist2 = (diff**2).sum(axis=-1)
        within = dist2 <= self.catch_radius**2

        rew_p = (
            self.catch_reward * within.sum(axis=1).astype(jnp.float32)
            - self.step_cost
        )
        caught = within.any(axis=0)
        rew_e = jnp.where(
            caught, -self.catch_reward, self.survive_bonus
        ).astype(jnp.float32)

        t_norm = (t / self.episode_length).astype(jnp.float32)
        mean_e = loc_e.mean(axis=0)
        obs_p = jnp.concatenate(
            [
                loc_p / L,
                (mean_e[None, :] - loc_p) / L,
                jnp.full((P, 1), t_norm),
            ],
            axis=1,
        )  # (P, 5)

        # nearest pursuer per evader: argmin -> one-hot select (gather-free)
        nearest = jnp.argmin(dist2, axis=0)  # (E,)
        sel = (jnp.arange(P)[None, :] == nearest[:, None]).astype(
            jnp.float32
        )  # (E, P)
        nearest_loc = sel @ loc_p  # (E, 2)
        obs_e_self = loc_e / L
        obs_e_nearest = (nearest_loc - loc_e) / L

        # legal-move mask (stay always legal; clip bounds inclusive)
        cand = loc_e[:, None, :] + moves[None, :, :] * self.evader_step
        ok = (
            (cand[..., 0] >= 0.0)
            & (cand[..., 0] <= L)
            & (cand[..., 1] >= 0.0)
            & (cand[..., 1] <= L)
        )
        obs_e_mask = ok.astype(jnp.float32)  # (E, 5)

        done = jnp.where(t >= self.episode_length, 1, 0).astype(jnp.int32)

        out = dict(state)
        out["loc"] = loc
        out[f"{_OBS}_pursuer"] = obs_p
        out[f"{_OBS}_evader_self"] = obs_e_self
        out[f"{_OBS}_evader_nearest_pursuer"] = obs_e_nearest
        out[f"{_OBS}_evader_{Constants.ACTION_MASK}"] = obs_e_mask
        out[f"{_REWARDS}_pursuer"] = rew_p
        out[f"{_REWARDS}_evader"] = rew_e
        out[Constants.TIMESTEP] = t
        out[Constants.DONE] = done
        return out


env_registrar.add(AsymmetricPursuit, backend="cpu")
env_registrar.add(TpuAsymmetricPursuit, backend="tpu", name="AsymmetricPursuit")
