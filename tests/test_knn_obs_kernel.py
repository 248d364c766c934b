"""Fused Pallas kNN-observation kernel vs the pure-JAX reference
(interpret mode — runs on CPU in CI; the TPU path compiles the same
kernel)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
from warpdrive_tpu.ops.knn_obs import knn_observation
from warpdrive_tpu.utils.constants import Constants


@pytest.fixture(scope="module", autouse=True)
def _register():
    register_all_envs()


def _build_state(env, num_envs, seed):
    """Random mid-episode batched state (some agents already out)."""
    rng = np.random.RandomState(seed)
    N = env.num_agents
    E = num_envs
    return {
        "loc_x": jnp.asarray(
            rng.uniform(0, env.grid_length, (E, N)).astype(np.float32)
        ),
        "loc_y": jnp.asarray(
            rng.uniform(0, env.grid_length, (E, N)).astype(np.float32)
        ),
        "speed": jnp.asarray(rng.uniform(0, 1, (E, N)).astype(np.float32)),
        "acceleration": jnp.asarray(
            rng.uniform(-0.1, 0.1, (E, N)).astype(np.float32)
        ),
        "direction": jnp.asarray(
            rng.uniform(0, 2 * np.pi, (E, N)).astype(np.float32)
        ),
        "still_in_the_game": jnp.asarray(
            (rng.uniform(size=(E, N)) > 0.2).astype(np.int32)
        ),
        Constants.TIMESTEP: jnp.asarray(
            rng.randint(0, 100, (E,)).astype(np.int32)
        ),
    }


@pytest.mark.parametrize("num_agents,k", [(15, 4), (105, 10)])
def test_kernel_matches_pure_jax_observe(num_agents, k):
    env = TpuTagContinuous(
        num_taggers=max(2, num_agents // 5),
        num_runners=num_agents - max(2, num_agents // 5),
        grid_length=20.0,
        episode_length=100,
        use_full_observation=False,
        num_other_agents_observed=k,
    )
    E = 6
    state = _build_state(env, E, seed=3)

    ref = jax.vmap(env.observe_fn)(dict(state))

    feats = jnp.stack(
        [
            state["loc_x"] / env.grid_diagonal,
            state["loc_y"] / env.grid_diagonal,
            state["speed"] / (env.max_speed + np.float32(1e-10)),
            state["acceleration"] / (env.max_speed + np.float32(1e-10)),
            state["direction"] / np.float32(2 * np.pi),
        ],
        axis=1,
    )
    out = knn_observation(
        state["loc_x"],
        state["loc_y"],
        feats,
        jnp.asarray(env.agent_types, dtype=jnp.float32),
        state["still_in_the_game"].astype(jnp.float32),
        (state[Constants.TIMESTEP] / env.episode_length).astype(jnp.float32),
        n_agents=env.num_agents,
        k=k,
        interpret=True,
    )

    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
    )
