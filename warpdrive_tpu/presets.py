"""
Flagship-system presets shared by ``bench.py`` and ``__graft_entry__.py``.

Builds the headline TagContinuous system (5 taggers + 100 runners, two
policies — the benchmark configuration of reference ``README.md:53-55`` and
the JMLR paper) as pure functions ready for ``jax.jit``:

* ``env_only_step`` — action sampling from fixed logits + vmapped env step +
  done-driven auto-reset (the reference's "env simulation rate" metric,
  ``README.md:33-34``),
* ``full_loop_step`` — per-policy MLP forward + categorical sampling + env
  step + auto-reset (the full on-device WarpDrive loop,
  reference ``trainer_base.py:383-428``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from warpdrive_tpu.models.fully_connected import FullyConnected
from warpdrive_tpu.sampling.samplers import sample_from_logits
from warpdrive_tpu.utils.constants import Constants

_OBS = Constants.OBSERVATIONS

# Matches BASELINE.json ("5 taggers, 100 runners, 1000+ replicas") with the
# observation mode of the reference's own benchmark config
# (``run_configs/tag_continuous.yaml``: use_full_observation False,
# num_other_agents_observed 10).
FLAGSHIP_ENV_KWARGS = dict(
    num_taggers=5,
    num_runners=100,
    grid_length=20.0,
    episode_length=500,
    max_acceleration=0.1,
    min_acceleration=-0.1,
    max_turn=2.35619449,
    min_turn=-2.35619449,
    num_acceleration_levels=10,
    num_turn_levels=10,
    skill_level_runner=1.0,
    skill_level_tagger=1.0,
    max_speed=1.0,
    use_full_observation=False,
    num_other_agents_observed=10,
    runner_exits_game_after_tagged=True,
    tag_reward_for_tagger=10.0,
    tag_penalty_for_runner=-10.0,
    end_of_game_reward_for_runner=1.0,
    tagging_distance=0.02,
)


def build_flagship(num_envs: int = 64, fc_dims=(256, 256), seed: int = 0,
                   knn_algorithm: str | None = None,
                   knn_select: str | None = None,
                   model_dtype=None):
    """
    Build the flagship TagContinuous system.

    :returns: dict with ``engine``, ``params`` (per-policy pytrees),
        ``state`` (batched env state), ``full_loop_step(params, state, key)``
        and ``env_only_step(state, key)`` pure functions, and metadata.
    """
    from warpdrive_tpu.envs import register_all_envs
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous as TagContinuous

    register_all_envs()
    kwargs = dict(FLAGSHIP_ENV_KWARGS)
    # seed the ENV too: tagger placement / starting layout are drawn at
    # construction (RandomState(seed)); without this, two build_flagship
    # calls with the same `seed` produce different tagger id sets, so
    # observations (the neighbor type channel) differ between builds even
    # from identical physical states
    kwargs.setdefault("seed", seed)
    # kNN algorithm default for the flagship: "pallas_flat_exact" — the
    # round-5 flat-emit Mosaic kernel (ops/knn_obs.py v9: packed/exact
    # argmin ladder with a 5-op lowest-index tie-break, invalid-candidate
    # masking folded into two adds, one bf16 hi/lo MXU selection matmul,
    # flat slot-major emit) in its EXACT-tie mode: same selection
    # semantics as the round-3/4 "pallas_mxu_exact" default (0/67,200
    # slot deviations vs the numpy reference; the consistency oracle
    # passes on this exact config,
    # tests/test_consistency_flagship_bench_config.py), measured
    # 1,203K env-steps/s env-only @1000 envs / B=4 vs 1,058K for
    # pallas_mxu_exact @B=2 (artifacts/round5/r5_ab4..ab6).  The
    # quantized-tie variant "pallas_flat" reaches 1,463K — bench.py
    # reports it as a separate, clearly-labeled stage.  History:
    # round-3 A/Bs artifacts/round3/r3_ab2..r3_ab8; design notes
    # docs/performance.md §5-6.
    kwargs.setdefault("knn_algorithm", "pallas_flat_exact")
    # neighbor-feature selection for the XLA algorithms (ladder/packed/
    # topk/approx): "bf16pair" — MXU one-hot matmul with hi/lo bfloat16
    # feature pairs, ~10% faster whole-loop than the fused VPU masked-sum
    # on v5e (artifacts/round2/tpu_knn_select_mxu.log) at ~4e-6 absolute
    # obs error.  (The pallas kernels do their own in-kernel selection;
    # this knob is inert for them.)
    kwargs.setdefault("knn_select", "bf16pair")
    if knn_algorithm is not None:
        kwargs["knn_algorithm"] = knn_algorithm
    if knn_select is not None:
        kwargs["knn_select"] = knn_select
    # envs per Pallas grid block: B=4 is the v9 kernel's sharp optimum
    # (B=2 1063K / B=3 1061K / B=4 1135K / B=8 1024K @E=2000 exact;
    # B=5/6 regress — artifacts/round5/r5_ab4_results.jsonl).  The v3/v7
    # kernels measured best at B=2 (r3_ab8), so this default only
    # applies to the v9 "pallas_flat*" family.
    if kwargs["knn_algorithm"].startswith("pallas_flat"):
        kwargs.setdefault("knn_block_envs", 4)
    env = TagContinuous(**kwargs)
    engine = EnvEngine(env_obj=env, num_envs=num_envs, seed=seed)

    policy_ids = {
        "runner": np.where(env.agent_types == 0)[0].astype(np.int32),
        "tagger": np.where(env.agent_types == 1)[0].astype(np.int32),
    }
    a_space = env.action_space[0]
    heads = [int(n) for n in a_space.nvec]  # MultiDiscrete (accel, turn)

    rng = jax.random.PRNGKey(seed)
    params = {}
    models = {}
    obs0 = np.asarray(engine.state[_OBS])
    for tag, ids in policy_ids.items():
        models[tag] = FullyConnected(
            fc_dims=tuple(fc_dims), output_dims=tuple(heads),
            dtype=model_dtype,
        )
        obs_p = obs0[:, ids].reshape(num_envs, len(ids), -1)
        rng, sub = jax.random.split(rng)
        params[tag] = models[tag].init(sub, jnp.asarray(obs_p[:1]))

    n_agents = engine.n_agents
    ids_arr = {t: jnp.asarray(v) for t, v in policy_ids.items()}

    # split-step fast path: carry only the physical state; observations are
    # computed on the fly and fused into the policy matmul by XLA
    assert engine.has_split_step
    rollout_state = {
        k: v
        for k, v in engine.state.items()
        if k not in (_OBS, Constants.ACTIONS)
    }

    def _policy_actions(p, obs_all, key):
        actions = jnp.zeros((num_envs, n_agents, len(heads)), dtype=jnp.int32)
        keys = jax.random.split(key, 2 * len(policy_ids))
        for i, (tag, ids) in enumerate(sorted(ids_arr.items())):
            obs_p = jnp.take(obs_all, ids, axis=1)
            obs_p = obs_p.reshape(obs_p.shape[:2] + (-1,))
            logits_list, _ = models[tag].apply(p[tag], obs_p)
            cols = [
                sample_from_logits(keys[2 * i + j], logits)
                for j, logits in enumerate(logits_list)
            ]
            actions = actions.at[:, ids, :].set(jnp.stack(cols, axis=-1))
        return actions

    def full_loop_step(p, state, key):
        """One full WarpDrive loop step: obs + eval + sample + step + reset."""
        k_act, k_reset = jax.random.split(key)
        obs_all = engine.observe(state)
        actions = _policy_actions(p, obs_all, k_act)
        state = engine.step_physics(state, actions)
        return engine.auto_reset(state, k_reset)

    def env_only_step(carry, key):
        """Random-action env step + observation + auto-reset (env simulation
        rate).  The obs checksum keeps the observation computation live
        (XLA would otherwise dead-code-eliminate it)."""
        state, checksum = carry
        k_act, k_reset = jax.random.split(key)
        mins = jnp.zeros((len(heads),), dtype=jnp.int32)
        maxs = jnp.asarray(heads, dtype=jnp.int32)
        actions = jax.random.randint(
            k_act, (num_envs, n_agents, len(heads)), mins, maxs, dtype=jnp.int32
        )
        checksum = checksum + engine.observe(state).sum()
        state = engine.step_physics(state, actions)
        return engine.auto_reset(state, k_reset), checksum

    return {
        "engine": engine,
        "env": env,
        "models": models,
        "params": params,
        "state": rollout_state,
        "policy_ids": policy_ids,
        "full_loop_step": full_loop_step,
        "env_only_step": env_only_step,
        "num_envs": num_envs,
        "num_agents": n_agents,
    }
