"""The lane-packed batched steppers (round 5: ``step_batch_fn`` on
Pendulum/CartPole + the EnvEngine override hook) are layout-only — they
must be BITWISE identical to the vmapped per-replica ``step_fn`` for
every output array, including across auto-resets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.utils.env_registrar import env_registrar


@pytest.fixture(scope="module", autouse=True)
def _register():
    register_all_envs()


@pytest.mark.parametrize(
    "env_name,n_actions",
    [
        ("ClassicControlPendulumEnv", None),  # continuous torque
        ("ClassicControlCartPoleEnv", 2),
        ("ClassicControlMountainCarEnv", 3),
        ("ClassicControlContinuousMountainCarEnv", None),
        ("ClassicControlAcrobotEnv", 3),
    ],
)
def test_batched_step_bitwise_matches_vmapped(env_name, n_actions):
    cls = env_registrar.get(env_name, backend="tpu")
    eng = EnvEngine(env_obj=cls(episode_length=10, seed=3), num_envs=16,
                    seed=5)
    assert eng.step is not None
    env = eng.env
    assert hasattr(env, "step_batch_fn"), "hook under test missing"

    # the engine's production step IS the batched one; rebuild the
    # vmapped reference path explicitly
    vmapped = jax.jit(lambda st: jax.vmap(env.step_fn)(dict(st)))
    batched = eng._jit_step

    state = dict(eng.state)
    key = jax.random.PRNGKey(0)
    for i in range(12):  # crosses the episode_length=10 auto-reset
        key, k_act, k_reset = jax.random.split(key, 3)
        if n_actions is None:
            actions = jax.random.uniform(
                k_act, (16, 1, 1), minval=-2.0, maxval=2.0,
                dtype=jnp.float32,
            )
        else:
            actions = jax.random.randint(
                k_act, (16, 1, 1), 0, n_actions, dtype=jnp.int32
            )
        state_w = eng.write_actions(dict(state), actions)
        out_b = batched(dict(state_w))
        out_v = vmapped(dict(state_w))
        assert set(out_b.keys()) == set(out_v.keys())
        for name in out_v:
            np.testing.assert_array_equal(
                np.asarray(out_b[name]), np.asarray(out_v[name]),
                err_msg=f"{env_name}: array {name!r} diverged at step {i}",
            )
        state = eng.auto_reset(out_b, k_reset)
