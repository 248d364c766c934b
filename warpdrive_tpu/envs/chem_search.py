"""
SingleAgentOneAtomChemSearch: RL for atom-level chemistry search.

Capability parity with the reference's community example ``rlchemists``
(``example_envs/rlchemists/single_agent_one_atom/single_agent_one_atom.py``
and ``oneatom_actions_{2d,3d}.py``; Nature Communications project): a single
atom walks a 3-D energy-landscape grid ``(nx, ny, nz)`` toward a target
site.  Six discrete actions move ±1 along x/y/z with periodic wrapping; the
reward is the (normalized) energy drop ``(ienergy - en_array[x, y,
z - z_slab_lower]) / max_denergy`` clipped to ``[min_reward, 0]``, plus
``terminate_reward`` on reaching ``final_state``.

Mode semantics preserved exactly (reference ``oneatom_actions_2d.py`` vs
``_3d.py``):

* 2-D mode (``initial_state[2] == final_state[2]``): a move that leaves the
  valid z-slab KEEPS the bad position and pays ``-max_denergy`` (no energy
  lookup);
* 3-D mode: z-moves that would exit the slab are CANCELED (position
  reverted, plain lookup reward) so z-exploration is not biased.

The energy landscape is any user array (the reference loads DFT meshes from
``en_array/*.npy``); tests use synthetic landscapes.  TPU design: the
single-cell energy lookup per replica is a flattened one-element
``jnp.take`` (1 element/env — not the O(agents²) gather class that needs
one-hot rewrites; see docs/performance.md).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from warpdrive_tpu.envs.base import TpuEnvironmentContext
from warpdrive_tpu.utils.constants import Constants
from warpdrive_tpu.utils.data_feed import DataFeed
from warpdrive_tpu.utils.env_registrar import env_registrar
from warpdrive_tpu.utils.spaces import Discrete

_OBS = Constants.OBSERVATIONS
_ACTIONS = Constants.ACTIONS
_REWARDS = Constants.REWARDS

# ±1 moves along x, y, z (reference action ids 0..5)
ATOM_MOVES = np.array(
    [
        [1, 0, 0], [-1, 0, 0],
        [0, 1, 0], [0, -1, 0],
        [0, 0, 1], [0, 0, -1],
    ],
    dtype=np.int32,
)


class SingleAgentOneAtomChemSearch:
    """Numpy reference implementation (gym-style dict API)."""

    name = "SingleAgentOneAtomChemSearch"

    def __init__(
        self,
        ienergy=0.0,
        max_denergy=1.0,
        nx=0,
        ny=0,
        nz=0,
        z_slab_lower=0,
        z_slab_upper=0,
        initial_state=None,
        final_state=None,
        terminate_reward=10.0,
        min_reward=-1.0,
        episode_length=50,
        en_array=None,
        seed=None,
        env_backend="cpu",
    ):
        self.num_agents = 1
        self.agents = {0: True}
        assert initial_state is not None and final_state is not None
        self.initial_state = np.asarray(initial_state, dtype=np.int32)
        self.final_state = np.asarray(final_state, dtype=np.int32)
        self.is_3d = bool(self.initial_state[2] != self.final_state[2])
        self.norm_distance = np.float32(
            np.linalg.norm((self.final_state - self.initial_state).astype(np.float64))
        )
        self.ienergy = float(ienergy)
        self.max_denergy = float(max_denergy)
        assert self.max_denergy > 0
        self.nx, self.ny, self.nz = int(nx), int(ny), int(nz)
        self.z_slab_lower = int(z_slab_lower)
        self.z_slab_upper = int(z_slab_upper)
        effective_z = self.z_slab_upper - self.z_slab_lower
        self.en_array = np.asarray(en_array, dtype=np.float32)
        assert self.en_array.shape == (self.nx, self.ny, effective_z)
        self.terminate_reward = float(terminate_reward)
        self.min_reward = float(min_reward)
        assert episode_length > 0
        self.episode_length = int(episode_length)
        self.world_dim = np.array([self.nx, self.ny, self.nz], dtype=np.float32)
        assert self.z_slab_lower <= self.initial_state[2] < self.z_slab_upper

        self.action_space = {0: Discrete(len(ATOM_MOVES))}
        self.observation_space = None
        self.np_random = np.random.RandomState(seed)
        self.timestep = None
        self.global_state = None
        self.env_backend = env_backend

    # ----------------------------------------------------------- numpy path
    def _is_bad(self, state) -> bool:
        return bool(state[2] < self.z_slab_lower or state[2] >= self.z_slab_upper)

    def _lookup(self, state) -> float:
        return float(
            self.en_array[state[0], state[1], state[2] - self.z_slab_lower]
        )

    def generate_observation(self) -> dict:
        x = self.global_state.astype(np.float32) / self.world_dim
        d = np.float32(
            np.linalg.norm(
                (self.global_state - self.final_state).astype(np.float64)
            )
        ) / self.norm_distance
        return {0: np.append(x, d).astype(np.float32)}

    def reset(self):
        self.timestep = 0
        self.global_state = self.initial_state.copy()
        return self.generate_observation()

    def step(self, actions=None):
        self.timestep += 1
        assert isinstance(actions, dict) and len(actions) == 1
        action = int(np.asarray(actions[0]).reshape(-1)[0])
        state = self.global_state.copy()
        move = ATOM_MOVES[action]
        new = state + move
        # periodic wrap on every axis (reference actions wrap x/y/z)
        new[0] %= self.nx
        new[1] %= self.ny
        new[2] %= self.nz

        if self.is_3d and move[2] != 0 and self._is_bad(new):
            # 3-D: cancel z-moves that exit the slab (reference _3d.py:121-151)
            new[2] = state[2]
            denergy = self.ienergy - self._lookup(new)
        elif self._is_bad(new):
            # 2-D: keep the bad position, flat penalty (reference _2d.py:44-48)
            denergy = -self.max_denergy
        else:
            denergy = self.ienergy - self._lookup(new)

        self.global_state = new
        reward = float(np.clip(denergy / self.max_denergy, self.min_reward, 0.0))
        terminated = bool(np.all(new == self.final_state))
        if terminated:
            reward += self.terminate_reward

        obs = self.generate_observation()
        done = {"__all__": self.timestep >= self.episode_length or terminated}
        return obs, {0: reward}, done, {}


class TpuSingleAgentOneAtomChemSearch(
    SingleAgentOneAtomChemSearch, TpuEnvironmentContext
):
    """TPU step: the six action branches collapse into one vectorized pure
    function (move table one-hot contraction + masked energy lookup)."""

    def get_data_dictionary(self) -> DataFeed:
        data = DataFeed()
        assert self.global_state is not None, "call reset() first"
        data.add_data(
            "position",
            np.atleast_2d(self.global_state),
            save_copy_and_apply_at_reset=True,
            log_data_across_episode=True,
        )
        return data

    def step_fn(self, state: dict) -> dict:
        t = state[Constants.TIMESTEP] + 1
        pos = state["position"][0]  # (3,) int32
        action = state[_ACTIONS][0, 0]
        moves = jnp.asarray(ATOM_MOVES)
        # comparison-broadcast one-hot (eye[action] is itself a gather)
        onehot = (
            action == jnp.arange(len(ATOM_MOVES), dtype=jnp.int32)
        ).astype(jnp.int32)
        move = (onehot[None, :] @ moves)[0]
        dims = jnp.asarray([self.nx, self.ny, self.nz], dtype=jnp.int32)
        new = (pos + move) % dims

        bad = (new[2] < self.z_slab_lower) | (new[2] >= self.z_slab_upper)
        if self.is_3d:
            # cancel invalid z-moves (never penalize z exploration)
            new = jnp.where(bad, new.at[2].set(pos[2]), new)
            bad = jnp.zeros((), dtype=bool)

        eff_z = self.z_slab_upper - self.z_slab_lower
        en_flat = jnp.asarray(self.en_array.reshape(-1))
        zc = jnp.clip(new[2] - self.z_slab_lower, 0, eff_z - 1)
        flat_idx = (new[0] * self.ny + new[1]) * eff_z + zc
        denergy = jnp.where(
            bad,
            -self.max_denergy,
            self.ienergy - jnp.take(en_flat, flat_idx),
        )
        reward = jnp.clip(denergy / self.max_denergy, self.min_reward, 0.0)

        final = jnp.asarray(self.final_state)
        terminated = (new == final).all()
        reward = reward + jnp.where(terminated, self.terminate_reward, 0.0)

        xf = new.astype(jnp.float32) / jnp.asarray(self.world_dim)
        d = jnp.sqrt(
            ((new - final).astype(jnp.float32) ** 2).sum()
        ) / self.norm_distance
        obs = jnp.concatenate([xf, d[None]])[None, :]

        out = dict(state)
        out["position"] = new[None, :]
        out[_OBS] = obs
        out[_REWARDS] = reward[None].astype(jnp.float32)
        out[Constants.TIMESTEP] = t
        out[Constants.DONE] = jnp.where(
            (t >= self.episode_length) | terminated, 1, 0
        ).astype(jnp.int32)
        return out


class SingleAgentTwoAtomChemSearch:
    """
    Two-atom variant (reference ``rlchemists/single_agent_two_atom/``):
    state is 6 ints (atom A xyz, atom B xyz), the action is MultiDiscrete
    ``(2, 6)`` — which atom x which ±1 move; xy moves wrap periodically
    with a 6-D energy lookup ``en_array[xa, ya, za', xb, yb, zb']``;
    z-moves that leave the slab are REVERTED and pay ``-max_denergy``
    (reference ``twoatom_actions_3d.py:120-164`` — note this differs from
    the one-atom 3-D env, which cancels without penalty).
    """

    name = "SingleAgentTwoAtomChemSearch"

    def __init__(
        self,
        ienergy=0.0,
        max_denergy=1.0,
        nx=0,
        ny=0,
        nz=0,
        z_slab_lower=0,
        z_slab_upper=0,
        initial_state=None,
        final_state=None,
        terminate_reward=10.0,
        min_reward=-1.0,
        episode_length=50,
        en_array=None,
        seed=None,
        env_backend="cpu",
    ):
        self.num_agents = 1
        self.agents = {0: True}
        assert initial_state is not None and final_state is not None
        self.initial_state = np.asarray(initial_state, dtype=np.int32)
        self.final_state = np.asarray(final_state, dtype=np.int32)
        assert self.initial_state.shape == (6,)
        self.norm_distance_a = np.float32(
            np.linalg.norm(
                (self.final_state[:3] - self.initial_state[:3]).astype(np.float64)
            )
        )
        self.norm_distance_b = np.float32(
            np.linalg.norm(
                (self.final_state[3:] - self.initial_state[3:]).astype(np.float64)
            )
        )
        self.ienergy = float(ienergy)
        self.max_denergy = float(max_denergy)
        assert self.max_denergy > 0
        self.nx, self.ny, self.nz = int(nx), int(ny), int(nz)
        self.z_slab_lower = int(z_slab_lower)
        self.z_slab_upper = int(z_slab_upper)
        eff_z = self.z_slab_upper - self.z_slab_lower
        self.en_array = np.asarray(en_array, dtype=np.float32)
        assert self.en_array.shape == (
            self.nx, self.ny, eff_z, self.nx, self.ny, eff_z
        )
        self.terminate_reward = float(terminate_reward)
        self.min_reward = float(min_reward)
        self.episode_length = int(episode_length)
        self.world_dim = np.array(
            [self.nx, self.ny, self.nz] * 2, dtype=np.float32
        )
        assert self.z_slab_lower <= self.initial_state[2] < self.z_slab_upper
        assert self.z_slab_lower <= self.initial_state[5] < self.z_slab_upper

        from warpdrive_tpu.utils.spaces import MultiDiscrete

        self.action_space = {0: MultiDiscrete((2, len(ATOM_MOVES)))}
        self.observation_space = None
        self.np_random = np.random.RandomState(seed)
        self.timestep = None
        self.global_state = None
        self.env_backend = env_backend

    # ----------------------------------------------------------- numpy path
    def _lookup(self, s) -> float:
        zl = self.z_slab_lower
        return float(
            self.en_array[s[0], s[1], s[2] - zl, s[3], s[4], s[5] - zl]
        )

    def generate_observation(self) -> dict:
        x = self.global_state.astype(np.float32) / self.world_dim
        d1 = np.float32(
            np.linalg.norm(
                (self.global_state[:3] - self.final_state[:3]).astype(np.float64)
            )
        ) / self.norm_distance_a
        d2 = np.float32(
            np.linalg.norm(
                (self.global_state[3:] - self.final_state[3:]).astype(np.float64)
            )
        ) / self.norm_distance_b
        return {0: np.concatenate([x, [d1, d2]]).astype(np.float32)}

    def reset(self):
        self.timestep = 0
        self.global_state = self.initial_state.copy()
        return self.generate_observation()

    def step(self, actions=None):
        self.timestep += 1
        assert isinstance(actions, dict) and len(actions) == 1
        a = np.asarray(actions[0]).reshape(-1)
        atom_sel, move_id = int(a[0]), int(a[1])
        base = 3 * atom_sel
        s = self.global_state.copy()
        move = ATOM_MOVES[move_id]
        dims = [self.nx, self.ny, self.nz]
        for axis in range(3):
            s[base + axis] = (s[base + axis] + move[axis]) % dims[axis]

        z = s[base + 2]
        if move[2] != 0 and not (self.z_slab_lower <= z < self.z_slab_upper):
            # revert the z move AND pay the penalty (two-atom semantics)
            s[base + 2] = self.global_state[base + 2]
            denergy = -self.max_denergy
        else:
            denergy = self.ienergy - self._lookup(s)

        self.global_state = s
        reward = float(np.clip(denergy / self.max_denergy, self.min_reward, 0.0))
        terminated = bool(np.all(s == self.final_state))
        if terminated:
            reward += self.terminate_reward

        obs = self.generate_observation()
        done = {"__all__": self.timestep >= self.episode_length or terminated}
        return obs, {0: reward}, done, {}


class TpuSingleAgentTwoAtomChemSearch(
    SingleAgentTwoAtomChemSearch, TpuEnvironmentContext
):
    """TPU step: the 12 (atom, move) action branches collapse into one
    vectorized pure function."""

    def get_data_dictionary(self) -> DataFeed:
        data = DataFeed()
        assert self.global_state is not None, "call reset() first"
        data.add_data(
            "position",
            np.atleast_2d(self.global_state),
            save_copy_and_apply_at_reset=True,
            log_data_across_episode=True,
        )
        return data

    def step_fn(self, state: dict) -> dict:
        t = state[Constants.TIMESTEP] + 1
        pos = state["position"][0]  # (6,) int32
        acts = state[_ACTIONS][0]  # (2,) int32: (atom, move)
        atom_sel, move_id = acts[0], acts[1]
        moves = jnp.asarray(ATOM_MOVES)
        move3 = (
            jnp.eye(len(ATOM_MOVES), dtype=jnp.int32)[move_id][None, :] @ moves
        )[0]
        # scatter the 3-vector move onto the selected atom's slice
        atom_onehot = jnp.eye(2, dtype=jnp.int32)[atom_sel]  # (2,)
        move6 = jnp.concatenate([atom_onehot[0] * move3, atom_onehot[1] * move3])
        dims = jnp.asarray([self.nx, self.ny, self.nz] * 2, dtype=jnp.int32)
        new = (pos + move6) % dims

        z_moved = move3[2] != 0
        za_bad = (new[2] < self.z_slab_lower) | (new[2] >= self.z_slab_upper)
        zb_bad = (new[5] < self.z_slab_lower) | (new[5] >= self.z_slab_upper)
        bad = z_moved & (za_bad | zb_bad)
        # revert ONLY the moved atom's z on a bad move
        reverted = new.at[2].set(
            jnp.where(atom_onehot[0] > 0, pos[2], new[2])
        ).at[5].set(jnp.where(atom_onehot[1] > 0, pos[5], new[5]))
        new = jnp.where(bad, reverted, new)

        eff_z = self.z_slab_upper - self.z_slab_lower
        zl = self.z_slab_lower
        za = jnp.clip(new[2] - zl, 0, eff_z - 1)
        zb = jnp.clip(new[5] - zl, 0, eff_z - 1)
        flat_idx = (
            (((new[0] * self.ny + new[1]) * eff_z + za) * self.nx + new[3])
            * self.ny
            + new[4]
        ) * eff_z + zb
        en_flat = jnp.asarray(self.en_array.reshape(-1))
        denergy = jnp.where(
            bad,
            -self.max_denergy,
            self.ienergy - jnp.take(en_flat, flat_idx),
        )
        reward = jnp.clip(denergy / self.max_denergy, self.min_reward, 0.0)

        final = jnp.asarray(self.final_state)
        terminated = (new == final).all()
        reward = reward + jnp.where(terminated, self.terminate_reward, 0.0)

        xf = new.astype(jnp.float32) / jnp.asarray(self.world_dim)
        d1 = jnp.sqrt(
            ((new[:3] - final[:3]).astype(jnp.float32) ** 2).sum()
        ) / self.norm_distance_a
        d2 = jnp.sqrt(
            ((new[3:] - final[3:]).astype(jnp.float32) ** 2).sum()
        ) / self.norm_distance_b
        obs = jnp.concatenate([xf, d1[None], d2[None]])[None, :]

        out = dict(state)
        out["position"] = new[None, :]
        out[_OBS] = obs
        out[_REWARDS] = reward[None].astype(jnp.float32)
        out[Constants.TIMESTEP] = t
        out[Constants.DONE] = jnp.where(
            (t >= self.episode_length) | terminated, 1, 0
        ).astype(jnp.int32)
        return out


def make_synthetic_landscape(nx, ny, eff_z, seed=0, amplitude=1.0):
    """A smooth synthetic energy mesh (tests/demos; the reference ships DFT
    meshes as .npy data files)."""
    rng = np.random.RandomState(seed)
    x = np.linspace(0, 2 * np.pi, nx)[:, None, None]
    y = np.linspace(0, 2 * np.pi, ny)[None, :, None]
    z = np.linspace(0, 2 * np.pi, eff_z)[None, None, :]
    phase = rng.uniform(0, 2 * np.pi, size=3)
    return (
        amplitude
        * (
            np.sin(x + phase[0])
            + np.cos(2 * y + phase[1])
            + 0.5 * np.sin(z + phase[2])
        )
    ).astype(np.float32)


env_registrar.add(SingleAgentOneAtomChemSearch, backend="cpu")
env_registrar.add(
    TpuSingleAgentOneAtomChemSearch,
    backend="tpu",
    name="SingleAgentOneAtomChemSearch",
)
env_registrar.add(SingleAgentTwoAtomChemSearch, backend="cpu")
env_registrar.add(
    TpuSingleAgentTwoAtomChemSearch,
    backend="tpu",
    name="SingleAgentTwoAtomChemSearch",
)
