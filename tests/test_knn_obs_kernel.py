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


@pytest.mark.parametrize(
    "variant",
    ["packed", "onehot", "mxu", "mxu_exact", "twolevel", "twolevel_exact",
     "tiled", "tiled_exact", "tiled_mxudist", "tiled_mxudist_exact",
     "flat", "flat_exact", "flat_mxudist", "flat_mxudist_exact",
     "envlanes", "envlanes_exact"],
)
@pytest.mark.parametrize("num_agents,k", [(15, 4), (105, 10)])
def test_kernel_matches_pure_jax_observe(num_agents, k, variant):
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
        variant=variant,
    )

    assert out.shape == ref.shape
    if "mxudist" in variant:
        # the MXU-expansion distance build (v7 dist_mxu) is NEAR-exact:
        # candidates whose difference-form d2 values sit within the
        # expansion's f32-accumulation error (~ulps of |p_centered|^2)
        # may swap selection order — the same class as the packed trick's
        # 2^-16 tie window.  Assert the class: rare slot swaps only,
        # everything else at bf16-pair tolerance.
        close = np.isclose(np.asarray(out), np.asarray(ref), atol=8e-6)
        frac_bad = 1.0 - close.mean()
        assert frac_bad < 2e-3, f"too many selection swaps: {frac_bad:.4%}"
    elif variant.startswith(("mxu", "twolevel", "tiled", "flat")):
        # mxu reconstructs neighbor features from a bf16 hi/lo pair
        # (knn_obs.py v3): hi+lo is exact to the lo-residual rounding,
        # ~2^-17 relative of O(1) normalized features => ~4e-6 absolute.
        # Neighbor SELECTION is exact (same packed-argmin as v2).
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=8e-6
        )
    else:
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize("algo", ["topk", "ladder", "packed", "approx"])
def test_knn_algorithm_matches_passes(algo):
    """Every alternative kNN observation algorithm must equal the k-round
    argmin rewrite loop ("passes") — exactly for "topk" (stable
    lowest-index ties) and "ladder" (lexicographic monotonic ladder);
    "packed" quantizes the low mantissa bits, deterministic under the
    fixed seeds here — and match the numpy reference via the consistency
    checker."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import (
        TagContinuous,
        TpuTagContinuous,
    )
    from warpdrive_tpu.tools.consistency import EnvironmentCPUvsTPU

    kwargs = dict(
        num_taggers=3, num_runners=12, grid_length=8.0, episode_length=12,
        use_full_observation=False, num_other_agents_observed=4, seed=5,
        runner_exits_game_after_tagged=True, tagging_distance=0.15,
    )
    eng_a = EnvEngine(env_obj=TpuTagContinuous(**kwargs), num_envs=4, seed=2)
    eng_b = EnvEngine(
        env_obj=TpuTagContinuous(knn_algorithm=algo, **kwargs),
        num_envs=4, seed=2,
    )
    state = dict(eng_a.state)
    # randomize positions so ties/ordering are stressed
    key = jax.random.PRNGKey(0)
    state["loc_x"] = jax.random.uniform(key, state["loc_x"].shape) * 8.0
    state["loc_y"] = jax.random.uniform(
        jax.random.PRNGKey(1), state["loc_y"].shape
    ) * 8.0
    obs_a = np.asarray(eng_a.observe(state))
    obs_b = np.asarray(eng_b.observe(state))
    np.testing.assert_allclose(obs_a, obs_b, rtol=1e-6, atol=1e-6)

    # full lockstep consistency of the variant vs the numpy reference
    EnvironmentCPUvsTPU(
        cpu_env_class=TagContinuous,
        tpu_env_class=lambda **kw: TpuTagContinuous(
            knn_algorithm=algo, **kw
        ),
        env_configs={"base": kwargs},
        num_envs=3,
        num_episodes=2,
    ).test_env_reset_and_step(threshold_pct=0.1, seed=9)


def test_pallas_observe_batch_wiring():
    """knn_algorithm='pallas' routes EnvEngine.observe through the fused
    kernel (interpret mode on CPU) and matches the pure-JAX observation."""
    import numpy as np

    import jax

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous

    kwargs = dict(
        num_taggers=3, num_runners=12, grid_length=8.0, episode_length=12,
        use_full_observation=False, num_other_agents_observed=4, seed=5,
    )
    eng_ref = EnvEngine(env_obj=TpuTagContinuous(**kwargs), num_envs=4, seed=2)
    eng_pl = EnvEngine(
        env_obj=TpuTagContinuous(knn_algorithm="pallas", **kwargs),
        num_envs=4, seed=2,
    )
    assert eng_pl.env.observe_batch_fn is not None
    state = dict(eng_ref.state)
    state["loc_x"] = jax.random.uniform(
        jax.random.PRNGKey(7), state["loc_x"].shape
    ) * 8.0
    state["loc_y"] = jax.random.uniform(
        jax.random.PRNGKey(8), state["loc_y"].shape
    ) * 8.0
    np.testing.assert_allclose(
        np.asarray(eng_pl.observe(state)),
        np.asarray(eng_ref.observe(state)),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("algo", ["ladder", "packed", "approx"])
def test_knn_algorithm_beyond_pallas_lane_limit(algo):
    """The XLA kNN paths must keep working past the Pallas kernel's
    128-lane cap (reference supports up to 1024 agents/env): 150 agents,
    observation equality vs the k-round argmin baseline on one state."""
    import numpy as np

    import jax

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous

    kwargs = dict(
        num_taggers=10, num_runners=140, grid_length=15.0,
        episode_length=10, use_full_observation=False,
        num_other_agents_observed=8, seed=11,
        runner_exits_game_after_tagged=True, tagging_distance=0.1,
    )
    eng_a = EnvEngine(env_obj=TpuTagContinuous(**kwargs), num_envs=2, seed=3)
    eng_b = EnvEngine(
        env_obj=TpuTagContinuous(knn_algorithm=algo, **kwargs),
        num_envs=2, seed=3,
    )
    state = dict(eng_a.state)
    state["loc_x"] = jax.random.uniform(
        jax.random.PRNGKey(2), state["loc_x"].shape) * 15.0
    state["loc_y"] = jax.random.uniform(
        jax.random.PRNGKey(3), state["loc_y"].shape) * 15.0
    obs_a = np.asarray(eng_a.observe(state))
    obs_b = np.asarray(eng_b.observe(state))
    np.testing.assert_allclose(obs_a, obs_b, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("select", ["fused", "gather"])
def test_knn_select_modes_match(select):
    """Both neighbor-feature selection modes (fused one-hot masked-sum and
    take_along_axis gather) must produce identical observations."""
    import numpy as np

    import jax

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous

    kwargs = dict(
        num_taggers=3, num_runners=12, grid_length=8.0, episode_length=12,
        use_full_observation=False, num_other_agents_observed=4, seed=5,
        knn_algorithm="packed",
    )
    eng_a = EnvEngine(env_obj=TpuTagContinuous(knn_select="fused", **kwargs),
                      num_envs=3, seed=2)
    eng_b = EnvEngine(env_obj=TpuTagContinuous(knn_select=select, **kwargs),
                      num_envs=3, seed=2)
    state = dict(eng_a.state)
    state["loc_x"] = jax.random.uniform(
        jax.random.PRNGKey(4), state["loc_x"].shape) * 8.0
    state["loc_y"] = jax.random.uniform(
        jax.random.PRNGKey(5), state["loc_y"].shape) * 8.0
    obs_a = np.asarray(eng_a.observe(state))
    obs_b = np.asarray(eng_b.observe(state))
    np.testing.assert_array_equal(obs_a, obs_b)


def test_knn_select_bf16pair_close():
    """bf16pair (MXU hi/lo-bfloat16 one-hot matmul selection) must match
    the fused selection to the hi/lo-split reconstruction error (~4e-6):
    the one-hot LHS selects rows exactly, so the only deviation is the
    bfloat16 rounding of the lo residual."""
    import numpy as np

    import jax

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous

    kwargs = dict(
        num_taggers=3, num_runners=12, grid_length=8.0, episode_length=12,
        use_full_observation=False, num_other_agents_observed=4, seed=5,
        knn_algorithm="packed",
    )
    eng_a = EnvEngine(env_obj=TpuTagContinuous(knn_select="fused", **kwargs),
                      num_envs=3, seed=2)
    eng_b = EnvEngine(
        env_obj=TpuTagContinuous(knn_select="bf16pair", **kwargs),
        num_envs=3, seed=2)
    state = dict(eng_a.state)
    state["loc_x"] = jax.random.uniform(
        jax.random.PRNGKey(4), state["loc_x"].shape) * 8.0
    state["loc_y"] = jax.random.uniform(
        jax.random.PRNGKey(5), state["loc_y"].shape) * 8.0
    obs_a = np.asarray(eng_a.observe(state))
    obs_b = np.asarray(eng_b.observe(state))
    np.testing.assert_allclose(obs_a, obs_b, atol=2e-5, rtol=0)


def test_pallas_beyond_lane_limit_routing():
    """Above 128 agents the mxu kernels auto-route to their multi-tile
    generalization (same selection semantics); single-tile-only variants
    must still fail LOUDLY at construction, not via a bare assert at
    first observe trace."""
    import pytest

    env = TpuTagContinuous(
        num_taggers=20, num_runners=120, grid_length=20.0,
        episode_length=10, use_full_observation=False,
        num_other_agents_observed=10,
        knn_algorithm="pallas_mxu_exact",
    )
    assert env.knn_algorithm == "pallas_tiled_exact"

    with pytest.raises(ValueError, match="128"):
        TpuTagContinuous(
            num_taggers=20, num_runners=120, grid_length=20.0,
            episode_length=10, use_full_observation=False,
            num_other_agents_observed=10,
            knn_algorithm="pallas_twolevel",
        )


@pytest.mark.parametrize("variant", ["tiled", "tiled_exact",
                                     "flat", "flat_exact"])
@pytest.mark.parametrize("num_agents,k", [(200, 6), (300, 10)])
def test_tiled_kernel_multi_tile_agents(num_agents, k, variant):
    """The v7 tiled kernel handles >128 agents (multiple observer lane
    tiles + a >LANE candidate sublane axis) — the capability the
    reference's multi-block grid + env_thread_sync barriers provide
    (VERDICT r3 missing #2); selection must equal the pure-JAX exact
    observe."""
    env = TpuTagContinuous(
        num_taggers=num_agents // 5,
        num_runners=num_agents - num_agents // 5,
        grid_length=25.0,
        episode_length=100,
        use_full_observation=False,
        num_other_agents_observed=k,
    )
    E = 3
    state = _build_state(env, E, seed=11)
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
        variant=variant,
    )
    assert out.shape == ref.shape
    if variant in ("tiled", "flat"):
        # packed-index ties: the tie window is 2^-(23 - ceil(log2 SUBn))
        # relative — coarser at 300 agents (2^-14) than at 105 (2^-16);
        # rare near-tie slot swaps are the documented class
        close = np.isclose(np.asarray(out), np.asarray(ref), atol=8e-6)
        frac_bad = 1.0 - close.mean()
        assert frac_bad < 2e-3, f"too many selection swaps: {frac_bad:.4%}"
    else:
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=8e-6
        )


@pytest.mark.parametrize("num_agents,k", [(105, 10), (30, 4)])
def test_flat_unrolled_ladder_matches_fori(num_agents, k):
    """The statically-unrolled ladder (the TPU default at k<=16) is the
    same math as the fori_loop ladder — outputs must be bit-identical in
    interpret mode for both exactness classes."""
    env = TpuTagContinuous(
        num_taggers=max(2, num_agents // 5),
        num_runners=num_agents - max(2, num_agents // 5),
        grid_length=20.0,
        episode_length=100,
        use_full_observation=False,
        num_other_agents_observed=k,
    )
    state = _build_state(env, 4, seed=13)
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
    args = (
        state["loc_x"], state["loc_y"], feats,
        jnp.asarray(env.agent_types, dtype=jnp.float32),
        state["still_in_the_game"].astype(jnp.float32),
        (state[Constants.TIMESTEP] / env.episode_length).astype(jnp.float32),
    )
    for variant in ("flat_exact", "flat"):
        a = knn_observation(*args, n_agents=env.num_agents, k=k,
                            interpret=True, variant=variant, unroll=False)
        b = knn_observation(*args, n_agents=env.num_agents, k=k,
                            interpret=True, variant=variant, unroll=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("num_agents,k,num_envs", [(105, 10, 6), (200, 6, 3)])
def test_flat_raw_layout_roundtrip(num_agents, k, num_envs):
    """The v9 flat raw layout (``raw_out=True``) carries exactly the
    contract observation: ``flat_obs_to_contract`` must reproduce the
    ``raw_out=False`` output bit-for-bit, and the layout must place
    channel c of slot s for agent i at ``[c, (tile*(k+1)+s)*LANE + i]``
    (the contract consumers like the policy's first matmul rely on)."""
    from warpdrive_tpu.ops.knn_obs import LANE, flat_obs_to_contract

    env = TpuTagContinuous(
        num_taggers=max(2, num_agents // 5),
        num_runners=num_agents - max(2, num_agents // 5),
        grid_length=20.0,
        episode_length=100,
        use_full_observation=False,
        num_other_agents_observed=k,
    )
    state = _build_state(env, num_envs, seed=7)
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
    args = (
        state["loc_x"], state["loc_y"], feats,
        jnp.asarray(env.agent_types, dtype=jnp.float32),
        state["still_in_the_game"].astype(jnp.float32),
        (state[Constants.TIMESTEP] / env.episode_length).astype(jnp.float32),
    )
    kw = dict(n_agents=env.num_agents, k=k, interpret=True,
              variant="flat_exact")
    contract = knn_observation(*args, **kw)
    raw = knn_observation(*args, raw_out=True, **kw)
    NT = (env.num_agents + LANE - 1) // LANE
    assert raw.shape == (num_envs, 8, NT * (k + 1) * LANE)
    np.testing.assert_array_equal(
        np.asarray(flat_obs_to_contract(raw, env.num_agents, k)),
        np.asarray(contract),
    )
    # spot-check the documented flat addressing directly
    i, s, c = min(100, env.num_agents - 1), k - 1, 3
    t, il = divmod(i, LANE)
    np.testing.assert_array_equal(
        np.asarray(raw[:, c, (t * (k + 1) + s) * LANE + il]),
        np.asarray(contract[:, i, s * 8 + c]),
    )


def test_tiled_observe_batch_wiring_150_agents():
    """knn_algorithm='pallas_tiled_exact' routes EnvEngine.observe through
    the multi-tile kernel above 128 agents and matches the pure-JAX exact
    observation."""
    from warpdrive_tpu.envs.engine import EnvEngine

    kwargs = dict(
        num_taggers=10, num_runners=140, grid_length=15.0,
        episode_length=10, use_full_observation=False,
        num_other_agents_observed=8, seed=11,
    )
    eng_ref = EnvEngine(env_obj=TpuTagContinuous(**kwargs), num_envs=2, seed=3)
    eng_pl = EnvEngine(
        env_obj=TpuTagContinuous(knn_algorithm="pallas_tiled_exact", **kwargs),
        num_envs=2, seed=3,
    )
    state = dict(eng_ref.state)
    state["loc_x"] = jax.random.uniform(
        jax.random.PRNGKey(2), state["loc_x"].shape) * 15.0
    state["loc_y"] = jax.random.uniform(
        jax.random.PRNGKey(3), state["loc_y"].shape) * 15.0
    np.testing.assert_allclose(
        np.asarray(eng_pl.observe(state)),
        np.asarray(eng_ref.observe(state)),
        atol=8e-6,
    )

@pytest.mark.parametrize("variant", ["envlanes", "envlanes_exact"])
@pytest.mark.parametrize("num_agents,k,num_envs", [(200, 6, 3), (15, 4, 130)])
def test_envlanes_kernel_multi_tile(num_agents, k, num_envs, variant):
    """The v8 envs-on-lanes kernel handles >128 agents (candidate
    sublanes grow, observer groups become a grid axis) and >128 envs
    (multiple env lane tiles); envlanes_exact must BIT-match the
    pure-JAX exact observe (f32 select — no bf16 pair rounding)."""
    env = TpuTagContinuous(
        num_taggers=max(2, num_agents // 5),
        num_runners=num_agents - max(2, num_agents // 5),
        grid_length=25.0,
        episode_length=100,
        use_full_observation=False,
        num_other_agents_observed=k,
    )
    state = _build_state(env, num_envs, seed=11)
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
        variant=variant,
    )
    assert out.shape == ref.shape
    if variant == "envlanes":
        # packed-index tie window (2^-(23 - ceil(log2 SUBn)) relative):
        # rare near-tie slot swaps are the documented class
        close = np.isclose(np.asarray(out), np.asarray(ref), atol=8e-6)
        frac_bad = 1.0 - close.mean()
        assert frac_bad < 2e-3, f"too many selection swaps: {frac_bad:.4%}"
    else:
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("variant", ["tiled_exact", "flat_exact"])
def test_exact_1024_agents_bench_geometry(variant):
    """Oracle parity at the EXACT 1024-agent bench-stage geometry
    (bench.py envelope stage: 20 taggers + 1004 runners, grid 60, k=10;
    pallas_flat_exact is the round-5 bench choice, tiled_exact the
    round-4 one) — 8 observer tiles.  Interpret mode; 2 envs keeps CPU
    time reasonable."""
    env = TpuTagContinuous(
        num_taggers=20,
        num_runners=1004,
        grid_length=60.0,
        episode_length=500,
        use_full_observation=False,
        num_other_agents_observed=10,
    )
    state = _build_state(env, 2, seed=5)
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
        (state[Constants.TIMESTEP] / env.episode_length).astype(
            jnp.float32
        ),
        n_agents=env.num_agents,
        k=10,
        interpret=True,
        variant=variant,
    )
    assert out.shape == ref.shape
    # selection is exact; features carry bf16 hi/lo pair rounding (~4e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=8e-6)
