"""Native (C++) CPU backend equivalence: the batched stepper must agree
with the per-env python loop (the numpy reference envs) in lockstep across
multiple episodes, including done-driven resets.

TagGridWorld is integer dynamics + analyzed float32 reward algebra ->
bit-exact. CartPole's sin/cos may differ from numpy's float32 loops by
~1 ulp -> float-precision tolerance on the trajectory."""

import numpy as np
import pytest

from warpdrive_tpu.envs.classic_control.cartpole import (
    ClassicControlCartPoleEnv,
)
from warpdrive_tpu.envs.cpu_engine import CpuEnvEngine
from warpdrive_tpu.envs.tag_gridworld import TagGridWorld
from warpdrive_tpu.utils.constants import Constants

_OBS = Constants.OBSERVATIONS
_REWARDS = Constants.REWARDS
_DONE = Constants.DONE


def _native_or_skip(**kw):
    from warpdrive_tpu.native import NativeBuildError

    try:
        return CpuEnvEngine(native=True, **kw)
    except NativeBuildError as exc:  # no toolchain in this container
        pytest.skip(f"native toolchain unavailable: {exc}")


def _lockstep(make_cfg, n_steps, rng, obs_exact=True):
    from warpdrive_tpu.utils.spaces import Discrete, MultiDiscrete

    eng_py = CpuEnvEngine(native=False, **make_cfg())
    eng_cc = _native_or_skip(**make_cfg())
    assert eng_cc._native is not None

    obs_a = eng_py.reset_all_envs()
    obs_b = eng_cc.reset_all_envs()
    np.testing.assert_array_equal(obs_a, obs_b)

    E, N = eng_py.n_envs, eng_py.n_agents
    C = eng_py.num_action_types
    space = eng_py.action_space[eng_py._agent_ids[0]]
    if isinstance(space, Discrete):
        def draw():
            return rng.integers(0, space.n, size=(E, N, C)).astype(np.int32)
    elif isinstance(space, MultiDiscrete):
        def draw():
            return np.stack(
                [
                    rng.integers(0, int(n), size=(E, N))
                    for n in space.nvec
                ],
                axis=-1,
            ).astype(np.int32)
    else:
        lo = float(np.asarray(space.low).reshape(-1)[0])
        hi = float(np.asarray(space.high).reshape(-1)[0])
        def draw():
            return rng.uniform(lo * 1.2, hi * 1.2, size=(E, N, C)).astype(
                np.float32
            )  # deliberately exceeds bounds to exercise action clipping
    resets_seen = 0
    for t in range(n_steps):
        actions = draw()
        out_a = eng_py.step_all_envs(actions)
        out_b = eng_cc.step_all_envs(actions)
        if obs_exact:
            np.testing.assert_array_equal(
                out_a[_OBS], out_b[_OBS], err_msg=f"obs diverged at t={t}"
            )
            np.testing.assert_array_equal(out_a[_REWARDS], out_b[_REWARDS])
        else:
            np.testing.assert_allclose(
                out_a[_OBS], out_b[_OBS], rtol=2e-4, atol=1e-5,
                err_msg=f"obs diverged at t={t}",
            )
            np.testing.assert_allclose(
                out_a[_REWARDS], out_b[_REWARDS], rtol=2e-4, atol=1e-5
            )
        np.testing.assert_array_equal(
            out_a[_DONE], out_b[_DONE], err_msg=f"done diverged at t={t}"
        )
        resets_seen += int(out_a[_DONE].sum())
        eng_py.reset_only_done_envs()
        eng_cc.reset_only_done_envs()
        np.testing.assert_array_equal(
            eng_py.state[_DONE], eng_cc.state[_DONE]
        )
        if obs_exact:
            np.testing.assert_array_equal(
                eng_py.state[_OBS], eng_cc.state[_OBS]
            )
    assert resets_seen > 0, "test never crossed an episode boundary"


def test_tag_gridworld_native_bit_exact():
    rng = np.random.default_rng(0)
    _lockstep(
        lambda: dict(
            env_obj=TagGridWorld(
                num_taggers=4, grid_length=6, episode_length=40, seed=11
            ),
            num_envs=8,
        ),
        n_steps=100,
        rng=rng,
        obs_exact=True,
    )


def test_tag_gridworld_native_partial_obs_bit_exact():
    rng = np.random.default_rng(1)
    _lockstep(
        lambda: dict(
            env_obj=TagGridWorld(
                num_taggers=3, grid_length=5, episode_length=30, seed=5,
                use_full_observation=False,
            ),
            num_envs=6,
        ),
        n_steps=80,
        rng=rng,
        obs_exact=True,
    )


def test_cartpole_native_trajectory():
    rng = np.random.default_rng(2)
    _lockstep(
        lambda: dict(
            env_obj=ClassicControlCartPoleEnv(episode_length=60, seed=3),
            num_envs=8,
        ),
        n_steps=150,
        rng=rng,
        obs_exact=False,
    )


def test_pendulum_native_trajectory():
    from warpdrive_tpu.envs.classic_control.pendulum import (
        ClassicControlPendulumEnv,
    )

    rng = np.random.default_rng(4)
    _lockstep(
        lambda: dict(
            env_obj=ClassicControlPendulumEnv(episode_length=50, seed=7),
            num_envs=8,
        ),
        n_steps=120,
        rng=rng,
        obs_exact=False,
    )


def test_mountain_car_native_trajectory():
    from warpdrive_tpu.envs.classic_control.mountain_car import (
        ClassicControlMountainCarEnv,
    )

    rng = np.random.default_rng(5)
    _lockstep(
        lambda: dict(
            env_obj=ClassicControlMountainCarEnv(episode_length=60, seed=9),
            num_envs=8,
        ),
        n_steps=150,
        rng=rng,
        obs_exact=False,
    )


def test_continuous_mountain_car_native_trajectory():
    from warpdrive_tpu.envs.classic_control.continuous_mountain_car import (
        ClassicControlContinuousMountainCarEnv,
    )

    rng = np.random.default_rng(6)
    _lockstep(
        lambda: dict(
            env_obj=ClassicControlContinuousMountainCarEnv(
                episode_length=60, seed=13
            ),
            num_envs=8,
        ),
        n_steps=150,
        rng=rng,
        obs_exact=False,
    )


def test_acrobot_native_trajectory():
    # chaotic two-link dynamics: keep episodes short so ulp-level sin/cos
    # differences reset at episode boundaries before they can amplify
    from warpdrive_tpu.envs.classic_control.acrobot import (
        ClassicControlAcrobotEnv,
    )

    rng = np.random.default_rng(7)
    _lockstep(
        lambda: dict(
            env_obj=ClassicControlAcrobotEnv(episode_length=40, seed=17),
            num_envs=6,
        ),
        n_steps=100,
        rng=rng,
        obs_exact=False,
    )


def test_tag_continuous_native_full_obs():
    from warpdrive_tpu.envs.tag_continuous import TagContinuous

    rng = np.random.default_rng(8)
    _lockstep(
        lambda: dict(
            env_obj=TagContinuous(
                num_taggers=3, num_runners=7, grid_length=8.0,
                episode_length=40, seed=21, tagging_distance=0.05,
            ),
            num_envs=6,
        ),
        n_steps=100,
        rng=rng,
        obs_exact=False,
    )


def test_tag_continuous_native_knn_obs():
    from warpdrive_tpu.envs.tag_continuous import TagContinuous

    rng = np.random.default_rng(9)
    _lockstep(
        lambda: dict(
            env_obj=TagContinuous(
                num_taggers=3, num_runners=7, grid_length=8.0,
                episode_length=40, seed=23, tagging_distance=0.05,
                use_full_observation=False, num_other_agents_observed=4,
            ),
            num_envs=6,
        ),
        n_steps=100,
        rng=rng,
        obs_exact=False,
    )


def test_native_snapshot_restore_isolation():
    eng = _native_or_skip(
        env_obj=TagGridWorld(
            num_taggers=4, grid_length=6, episode_length=40, seed=11
        ),
        num_envs=4,
    )
    eng.reset_all_envs()
    rng = np.random.default_rng(3)
    E, N, C = eng.n_envs, eng.n_agents, eng.num_action_types
    for _ in range(5):
        eng.step_all_envs(rng.integers(0, 5, size=(E, N, C)).astype(np.int32))
        eng.reset_only_done_envs()
    snap = eng.snapshot_runtime_state()
    obs_before = eng.state[_OBS].copy()
    for _ in range(7):
        eng.step_all_envs(rng.integers(0, 5, size=(E, N, C)).astype(np.int32))
        eng.reset_only_done_envs()
    eng.restore_runtime_state(snap)
    np.testing.assert_array_equal(eng.state[_OBS], obs_before)
    # stepping after restore matches a fresh continuation
    acts = rng.integers(0, 5, size=(E, N, C)).astype(np.int32)
    out = eng.step_all_envs(acts)
    assert out[_OBS].shape == obs_before.shape


def test_native_auto_fallback_for_unsupported_env():
    """Envs without a native stepper silently use the python loop under
    native='auto' (the default)."""
    from warpdrive_tpu.envs.dummy_env import DummyEnv

    eng = CpuEnvEngine(
        env_obj=DummyEnv(num_agents=3, episode_length=4, seed=0),
        num_envs=2,
    )
    assert eng._native is None
    eng.reset_all_envs()
    acts = np.zeros((2, 3, 1), np.int32)
    out = eng.step_all_envs(acts)
    assert out[_OBS].shape[0] == 2
