"""
Headline benchmark: TagContinuous environment-simulation throughput.

Measures env-steps/s (one env-step = one replica advancing one timestep; all
105 agents of a replica advance together) of the flagship TagContinuous
system (5 taggers + 100 runners) with the WHOLE loop fused in one jitted
``lax.scan`` — action generation, vmapped env physics (O(N²) pairwise
distances on the MXU), tagging resolution, observation build, and
done-driven auto-reset.

Baseline: the reference (salesforce/warp-drive) reports ~9.8M env-steps/s on
discrete Tag (JMLR 23(316); repo claim "millions of steps per second",
``README.md:33-34``); /root/repo/BASELINE.json sets the north star at 1e7
env-steps/s/chip for this config.  ``vs_baseline`` is measured against 1e7.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_ENV_STEPS_PER_S = 1.0e7


def rollout_rate_stats(step_fn, state, n_steps: int, num_envs: int, key,
                       params=None, repeats: int = 3) -> dict:
    """Time a jitted n-step scan of ``step_fn``; return env-steps/s
    dispersion stats over ``repeats`` fresh-key executions:
    ``{"value": median, "min": , "max": , "n": }`` (VERDICT r4 next #3 —
    single-draw numbers were being compared inside a +-10-25% noise
    band)."""

    if params is None:
        def scan_fn(st, k):
            keys = jax.random.split(k, n_steps)
            return jax.lax.scan(lambda s, kk: (step_fn(s, kk), 0), st, keys)[0]
        jitted = jax.jit(scan_fn)
        args = lambda st, k: (st, k)
    else:
        def scan_fn(p, st, k):
            keys = jax.random.split(k, n_steps)
            return jax.lax.scan(lambda s, kk: (step_fn(p, s, kk), 0), st, keys)[0]
        jitted = jax.jit(scan_fn)
        args = lambda st, k: (params, st, k)

    # warmup / compile (the carry may be a pytree; keep it opaque).
    # FETCH one element to host, not just block_until_ready: round-4
    # probes showed the tunnel can report a buffer "ready" whose actual
    # realization wedges (the envlanes kernel class) — a value fetch is
    # the only execution proof.
    key, sub = jax.random.split(key)
    state = jitted(*args(state, sub))
    np.asarray(jax.tree_util.tree_leaves(state)[0]).ravel()[:1]

    rates = []
    for _ in range(repeats):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state = jitted(*args(state, sub))
        # value fetch per repeat (same rationale as the warmup fetch)
        np.asarray(jax.tree_util.tree_leaves(state)[0]).ravel()[:1]
        dt = time.perf_counter() - t0
        rates.append(n_steps * num_envs / dt)
    return {
        "value": float(np.median(rates)),
        "min": float(min(rates)),
        "max": float(max(rates)),
        "n": len(rates),
    }


def rollout_rate(step_fn, state, n_steps: int, num_envs: int, key,
                 params=None, repeats: int = 3) -> float:
    """Best-of-repeats env-steps/s (the A/B-harness metric: best-of is
    the right comparator for code variants; the bench stages report
    median + spread via :func:`rollout_rate_stats`)."""
    return rollout_rate_stats(
        step_fn, state, n_steps, num_envs, key, params=params,
        repeats=repeats,
    )["max"]


def _disp(stats: dict) -> dict:
    """Dispersion fields for a bench JSON line from rollout_rate_stats
    output (value = MEDIAN of fresh-key repeats)."""
    return {
        "value": round(stats["value"]),
        "min": round(stats["min"]),
        "max": round(stats["max"]),
        "n": stats["n"],
    }


def _prof_disp(prof: dict) -> dict:
    """Dispersion fields from ``profile_phases`` per-repeat lists."""
    reps = prof.get("steps_per_sec_repeats") or [prof["steps_per_sec"]]
    return {
        "value": round(float(np.median(reps))),
        "min": round(min(reps)),
        "max": round(max(reps)),
        "n": len(reps),
    }


def _emit_error(stage: str, exc: Exception):
    """ALWAYS print one parseable JSON line, even on backend failure
    (round-1 gap: a raw traceback left BENCH_r01.json unparseable)."""
    print(
        json.dumps(
            {
                "metric": "tag_continuous_env_steps_per_sec",
                "value": 0,
                "unit": "env_steps/s",
                "vs_baseline": 0.0,
                "error": f"{stage}: {type(exc).__name__}: {exc}",
            }
        ),
        flush=True,
    )


def _device_probe_ok(timeout_s: float) -> bool:
    """Claim-wedge guard (round 5): a wedged tunnel claim makes
    ``jax.devices()`` BLOCK forever (it does not raise), which would
    hang the whole bench until an external kill and leave an EMPTY
    result file.  Probe the claim in a SUBPROCESS with a timeout; on
    timeout the caller falls back to CPU so every stage still emits a
    parseable (clearly cpu-labeled) line.  The probe's claim is
    released when it exits; round-4/5 kill history shows claim-phase
    kills are clean."""
    import subprocess

    code = "import jax; print(jax.devices()[0].platform, flush=True)"
    try:
        res = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return res.returncode == 0 and res.stdout.strip() != ""
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def main():
    import os

    # BENCH_PLATFORM=cpu forces the CPU backend (smoke tests / no chip)
    forced = os.environ.get("BENCH_PLATFORM", "")
    if forced:
        os.environ["JAX_PLATFORMS"] = forced
        jax.config.update("jax_platforms", forced)
    elif os.environ.get("BENCH_NO_PROBE", "") != "1":
        timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", "180"))
        print("[bench] probing device claim (subprocess, "
              f"{timeout_s:.0f}s timeout)...", file=sys.stderr, flush=True)
        if not _device_probe_ok(timeout_s):
            print(
                "[bench] device claim probe timed out/failed (wedged "
                "tunnel claim?) — falling back to CPU so the bench "
                "still emits parseable lines",
                file=sys.stderr, flush=True,
            )
            os.environ["JAX_PLATFORMS"] = "cpu"
            jax.config.update("jax_platforms", "cpu")

    from warpdrive_tpu.presets import build_flagship
    # shared by several independent stages — imported here so one stage's
    # failure cannot cascade as a NameError into later stages
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.utils.constants import Constants as _C

    print("[bench] acquiring device...", file=sys.stderr, flush=True)
    try:
        platform = jax.devices()[0].platform
    except Exception as exc:  # TPU backend unavailable / claim wedged
        if forced or os.environ.get("BENCH_NO_FALLBACK"):
            _emit_error("device_init", exc)
            sys.exit(1)
        print(
            f"[bench] device init failed ({exc}); falling back to CPU",
            file=sys.stderr, flush=True,
        )
        try:
            os.environ["JAX_PLATFORMS"] = "cpu"
            jax.config.update("jax_platforms", "cpu")
            platform = jax.devices()[0].platform
        except Exception as exc2:
            _emit_error("device_init_cpu_fallback", exc2)
            sys.exit(1)
    on_tpu = platform == "tpu"
    # 1024 replicas (>= the BASELINE.json "1000+ replicas" floor): the
    # round-5 continuation sweep (artifacts/round5/r5_ab12/ab13, both
    # build orders, 5-repeat medians, non-overlapping ranges) found the
    # power-of-two count beats E=1000 on BOTH flagship stages — exact
    # env-only 1473K vs 1436K (+2.6%) and full loop 1054K vs 1001K
    # (+5.4%); E=2000 (1007K full loop) and E=4000 (956K) regress.
    # Known hazard: E=1500 is pathologically slow (732K, reproducible,
    # r5_ab6) — keep env counts at powers of two (times 1000 or 1024).
    num_envs = 1024 if on_tpu else 32
    n_steps = 500 if on_tpu else 20

    try:
        print(f"[bench] building flagship system ({num_envs} envs)...", file=sys.stderr, flush=True)
        sys_ = build_flagship(num_envs=num_envs, fc_dims=(256, 256), seed=0)
        key = jax.random.PRNGKey(42)
        print("[bench] compiling + timing env-only rollout...", file=sys.stderr, flush=True)

        env_stats = rollout_rate_stats(
            sys_["env_only_step"],
            (sys_["state"], jnp.zeros(())),
            n_steps,
            num_envs,
            key,
            repeats=5 if on_tpu else 3,
        )
        env_rate = env_stats["value"]
    except Exception as exc:
        _emit_error("measure", exc)
        sys.exit(1)
    # emit the headline JSON line IMMEDIATELY so a timeout during the
    # (optional) full-loop measurement cannot lose the result
    headline = {
        "metric": "tag_continuous_env_steps_per_sec",
        **_disp(env_stats),
        "unit": "env_steps/s",
        "vs_baseline": round(env_rate / BASELINE_ENV_STEPS_PER_S, 4),
        "num_envs": num_envs,
        "num_agents": sys_["num_agents"],
        # presets default: the fused Mosaic kNN kernel in exact-tie
        # mode — 0/67,200 slot deviations vs the numpy reference on
        # a rolled on-chip state (artifacts/round3/r3_ab7); the
        # consistency oracle passes on this exact config
        # (tests/test_consistency_flagship_bench_config.py)
        "knn_algorithm": sys_["env"].knn_algorithm,
        "platform": platform,
    }
    print(json.dumps(headline), flush=True)
    print(
        f"[bench] platform={platform} envs={num_envs} agents={sys_['num_agents']} "
        f"steps/scan={n_steps}\n"
        f"[bench] env-only (random actions + obs + reset): "
        f"{env_rate:,.0f} env-steps/s "
        f"[{env_stats['min']:,.0f}..{env_stats['max']:,.0f}, "
        f"n={env_stats['n']}]",
        file=sys.stderr,
        flush=True,
    )
    print("[bench] compiling + timing full loop...", file=sys.stderr, flush=True)
    try:
        full_stats = rollout_rate_stats(
            sys_["full_loop_step"], sys_["state"], n_steps, num_envs, key,
            params=sys_["params"], repeats=5 if on_tpu else 3,
        )
        print(
            f"[bench] full loop (policy+sample+step+reset): "
            f"{full_stats['value']:,.0f} env-steps/s",
            file=sys.stderr,
            flush=True,
        )
        print(
            json.dumps(
                {
                    "metric": "tag_continuous_full_loop_env_steps_per_sec",
                    **_disp(full_stats),
                    "unit": "env_steps/s",
                    "vs_baseline": round(
                        full_stats["value"] / BASELINE_ENV_STEPS_PER_S, 4
                    ),
                    "num_envs": num_envs,
                    "platform": platform,
                }
            ),
            flush=True,
        )
    except Exception as exc:
        print(f"[bench] full-loop stage failed: {exc}", file=sys.stderr, flush=True)

    # fast flagship variant: the flat-emit Mosaic kernel with the
    # candidate index packed into low mantissa bits (ONE integer min per
    # slot instead of the exact 5-op tie-break) — the round-5 sweep
    # winner (artifacts/round5/r5_ab4..ab6: pallas_flat 1463K median
    # @E=1000/B=4 vs pallas_tiled 1214K @B=2), at the price of index
    # tie-breaks for distances within relative 2^-16 (measured 0-2 of
    # 67,200 slots deviate on rolled states; artifacts/round3).
    # Clearly labeled: the HEADLINE above is the oracle-exact config.
    fast_envs = 1024 if on_tpu else 32  # r5_ab10: 1798K @1024 vs 1742K @1000
    try:
        print("[bench] compiling + timing fast (packed-tie) variant...",
              file=sys.stderr, flush=True)
        sys_fast = build_flagship(num_envs=fast_envs, fc_dims=(256, 256),
                                  seed=0, knn_algorithm="pallas_flat")
        fast_stats = rollout_rate_stats(
            sys_fast["env_only_step"],
            (sys_fast["state"], jnp.zeros(())),
            n_steps,
            fast_envs,
            key,
            repeats=5 if on_tpu else 3,
        )
        print(
            json.dumps(
                {
                    "metric": "tag_continuous_env_steps_per_sec_fast",
                    **_disp(fast_stats),
                    "unit": "env_steps/s",
                    "vs_baseline": round(
                        fast_stats["value"] / BASELINE_ENV_STEPS_PER_S, 4
                    ),
                    "num_envs": fast_envs,
                    "knn_algorithm": sys_fast["env"].knn_algorithm,
                    "exactness": "near-tie index tie-breaks, <=2/67200 slots",
                    "platform": platform,
                }
            ),
            flush=True,
        )
        print(f"[bench] fast variant env-only: "
              f"{fast_stats['value']:,.0f} env-steps/s",
              file=sys.stderr, flush=True)
    except Exception as exc:
        print(f"[bench] fast-variant stage failed: {exc}",
              file=sys.stderr, flush=True)

    # free the flagship systems' device buffers + compiled programs
    # before the training stages (HBM pressure from earlier stages is a
    # suspected contributor to cross-stage slowdowns)
    try:
        import gc

        del sys_, sys_fast, env_stats, full_stats, fast_stats
        gc.collect()
        jax.clear_caches()
    except Exception:
        pass

    # training throughput: one fused A2C iteration (rollout scan + loss +
    # update) on TagGridWorld at benchmark scale — the reference's
    # "training" perf-stat dimension (trainer_base.py:863-879)
    try:
        print("[bench] compiling + timing training iteration...", file=sys.stderr, flush=True)
        import numpy as _np

        from warpdrive_tpu.envs.tag_gridworld import TpuTagGridWorld
        from warpdrive_tpu.training.trainer_a2c import TrainerA2C

        # 32K replicas + bf16 model/batch + env-axis minibatching: the
        # measured training optimum (artifacts/round3/r3_ab10: 4.79M
        # @2000 f32 -> 11.54M @32000 bf16+mb4; round-4: fused head
        # 12.46M @mb8, then the gather kills — one-hot STEP_ACTIONS +
        # one-hot nearest-target + identity policy take — cut the
        # rollout 165.6 -> 82-90 ms, and the post-fix minibatch resweep
        # found mb64: 25.3M (r4_ab5e/ab5f; mb128 regresses on dispatch).
        # 64K envs REGRESSES (super-linear rollout cost, r4_ab5).
        t_envs = 32000 if on_tpu else 16
        T_train = 100 if on_tpu else 10
        env = TpuTagGridWorld(
            num_taggers=4, grid_length=20, episode_length=100, seed=7,
            use_full_observation=False,
        )
        engine = EnvEngine(env_obj=env, num_envs=t_envs, seed=7)
        cfg = {
            "name": "bench_train",
            "env": {},
            "trainer": {
                "num_envs": t_envs,
                "num_episodes": 4 * T_train * t_envs // 100,
                "train_batch_size": T_train * t_envs,
                "seed": 1,
                "batch_dtype": "bfloat16" if on_tpu else "float32",
            },
            "policy": {"shared": {"to_train": True, "gamma": 0.98,
                                  "lr": 0.001,
                                  "num_minibatches": 64 if on_tpu else 1,
                                  "shuffle_minibatches": False,
                                  "model": {"type": "fully_connected",
                                            "fc_dims": [64, 64],
                                            **({"dtype": "bfloat16"}
                                               if on_tpu else {})}}},
            "saving": {"metrics_log_freq": 10**9,
                       "model_params_save_freq": 10**9,
                       "basedir": "/tmp", "name": "bench", "tag": "t"},
        }
        trainer = TrainerA2C(env_wrapper=engine, config=cfg, verbose=False)
        prof = trainer.profile_phases(repeats=3)
        gdisp = _prof_disp(prof)
        print(
            json.dumps(
                {
                    "metric": "tag_gridworld_training_env_steps_per_sec",
                    **gdisp,
                    "unit": "env_steps/s",
                    "vs_baseline": round(
                        gdisp["value"] / BASELINE_ENV_STEPS_PER_S, 4
                    ),
                    "rollout_ms": round(prof["rollout_ms"], 2),
                    "update_ms": round(prof["update_ms"], 2),
                    # storage/update knobs this number was measured with —
                    # NOT comparable to an all-f32 single-minibatch run
                    "batch_dtype": cfg["trainer"]["batch_dtype"],
                    "model_dtype": cfg["policy"]["shared"]["model"].get(
                        "dtype", "float32"
                    ),
                    "num_minibatches": cfg["policy"]["shared"][
                        "num_minibatches"
                    ],
                    "platform": platform,
                }
            ),
            flush=True,
        )
    except Exception as exc:
        print(f"[bench] training stage failed: {exc}", file=sys.stderr, flush=True)

    # discrete-Tag env-simulation rate: the configuration class the
    # reference's headline ~9.8M env-steps/s figure actually measures
    # (JMLR 23(316): discrete Tag, 5 agents, V100).  Random actions +
    # observation build + done-driven auto-reset in one scan.  32K
    # replicas is the measured on-chip optimum (artifacts/round3/
    # r3_ab11: 15.6M @2000, 26.2M @8000, 31.4M @32000, 29.7M @64000).
    try:
        print("[bench] compiling + timing TagGridWorld env-only rollout...",
              file=sys.stderr, flush=True)

        # 32768 (= 2^15, "32K"): lane-aligned power of two — won both
        # build orders of the r5_ab14/ab14b A/B (362.6 vs 334.2 M and
        # 376.7 vs 373.8 M; the delta is small because 32000 envs x 5
        # agents = 160000 rows is already /128-aligned via the agent
        # axis).  The TRAINING stage stays at 32000/mb64 — that exact
        # geometry is learning-validated (r5_learncheck_gridworld).
        ge_envs = 32768 if on_tpu else 16
        # 2000-step scans: at >300M env-steps/s a 500-step scan is only
        # ~45 ms of device compute, so the per-scan dispatch latency of
        # the tunneled deployment (~20 ms when healthy, 100+ ms under
        # tunnel load — the round-5 instability post-mortem, /tmp
        # gw_check runs: the same program measured 34.7M / 136.7M /
        # 245M across sessions at 500 steps, 366M at 2000) dominates
        # the measurement.  Longer scans amortize it.
        g_steps = 2000 if on_tpu else 20
        genv = TpuTagGridWorld(
            num_taggers=4, grid_length=20, episode_length=100, seed=7,
            use_full_observation=False,
        )
        gengine = EnvEngine(env_obj=genv, num_envs=ge_envs, seed=7)
        g_state = dict(gengine.state)
        g_nact = genv.action_space[0].n
        g_nagents = gengine.n_agents

        # TagGridWorld computes obs inside step_fn (no split-step physics/
        # observe pair), so the env-only loop uses the engine's pure
        # ``step`` program; the obs checksum keeps the obs write live.
        def g_env_step(carry, key):
            state, checksum = carry
            k_act, k_reset = jax.random.split(key)
            actions = jax.random.randint(
                k_act, (ge_envs, g_nagents), 0, g_nact, dtype=jnp.int32
            )
            state = gengine.step(state, actions)
            checksum = checksum + state[_C.OBSERVATIONS].sum()
            return gengine.auto_reset(state, k_reset), checksum

        g_stats = rollout_rate_stats(
            g_env_step, (g_state, jnp.zeros(())), g_steps, ge_envs, key,
            repeats=5 if on_tpu else 3,
        )
        g_rate = g_stats["value"]
        print(
            json.dumps(
                {
                    "metric": "tag_gridworld_env_steps_per_sec",
                    **_disp(g_stats),
                    "unit": "env_steps/s",
                    "vs_baseline": round(g_rate / BASELINE_ENV_STEPS_PER_S, 4),
                    "num_envs": ge_envs,
                    "num_agents": int(g_nagents),
                    "platform": platform,
                }
            ),
            flush=True,
        )
        print(f"[bench] TagGridWorld env-only: {g_rate:,.0f} env-steps/s",
              file=sys.stderr, flush=True)
    except Exception as exc:
        print(f"[bench] gridworld env-only stage failed: {exc}",
              file=sys.stderr, flush=True)

    # classic-control concurrency envelope: 100K concurrent CartPole
    # replicas in ONE fused scan (the reference's headline concurrency
    # claim, CHANGELOG.md:8-17 "100k concurrent environments") — random
    # actions + step + done-driven auto-reset; the obs checksum keeps the
    # observation write live.
    try:
        print("[bench] compiling + timing CartPole 100K env-only rollout...",
              file=sys.stderr, flush=True)
        from warpdrive_tpu.envs.classic_control.cartpole import (
            TpuClassicControlCartPoleEnv,
        )

        # 131072 (= 2^17, >= the reference's "100k concurrent" claim):
        # 100000/128 = 781.25 leaves a ragged trailing lane tile; the
        # lane-aligned count won BOTH build orders of r5_ab14/ab14b
        # (373.4 vs 339.8 M and 395.9 vs 348.3 M, +10-14%).  The metric
        # name keeps its historical "100k" identity; num_envs records
        # the actual count.
        c_envs = 131_072 if on_tpu else 1000
        c_steps = 500 if on_tpu else 20  # amortize per-scan dispatch
        cenv = TpuClassicControlCartPoleEnv(episode_length=200, seed=5)
        cengine = EnvEngine(env_obj=cenv, num_envs=c_envs, seed=5)
        c_state = dict(cengine.state)

        def c_env_step(carry, key):
            state, checksum = carry
            k_act, k_reset = jax.random.split(key)
            actions = jax.random.randint(
                k_act, (c_envs, 1), 0, 2, dtype=jnp.int32
            )
            state = cengine.step(state, actions)
            checksum = checksum + state[_C.OBSERVATIONS].sum()
            return cengine.auto_reset(state, k_reset), checksum

        c_stats = rollout_rate_stats(
            c_env_step, (c_state, jnp.zeros(())), c_steps, c_envs, key,
            repeats=5 if on_tpu else 3,
        )
        c_rate = c_stats["value"]
        print(
            json.dumps(
                {
                    "metric": "cartpole_100k_env_steps_per_sec",
                    **_disp(c_stats),
                    "unit": "env_steps/s",
                    "vs_baseline": round(c_rate / BASELINE_ENV_STEPS_PER_S, 4),
                    "num_envs": c_envs,
                    "platform": platform,
                }
            ),
            flush=True,
        )
        print(f"[bench] CartPole 100K env-only: {c_rate:,.0f} env-steps/s",
              file=sys.stderr, flush=True)
    except Exception as exc:
        print(f"[bench] cartpole 100k stage failed: {exc}",
              file=sys.stderr, flush=True)

    # 1024-agent TagContinuous: the top of the reference's agents-per-env
    # envelope (README.md:13-26 "up to 1024 agents"; BASELINE.json config
    # #5).  Round 5 (artifacts/round5/r5_ab11): the v9 flat kernel +
    # tagger-set physics take the oracle-exact stage 17.0K -> 22.3K
    # env-steps/s @E=256 (22.8M agent-steps/s, +31% over round 4); the
    # surgical decomposition shows the kernel is EXACT-LADDER-bound at
    # N=1024 (5.6 of 11.5 ms/fleet-step; k x 6 data-dependent full-
    # matrix passes over 1024 candidate sublanes), NOT distance-bound —
    # the MXU distance build wins its component there (confirming the
    # r4 verdict hypothesis) and the near-exact classes reach
    # "pallas_flat_mxudist" 33.3K (34.1M agent-steps/s) for anyone
    # trading exactness.  First compile ~10 min.
    try:
        print("[bench] compiling + timing 1024-agent TagContinuous...",
              file=sys.stderr, flush=True)
        from warpdrive_tpu.envs.tag_continuous import (
            TpuTagContinuous as _TTC,
        )
        from warpdrive_tpu.presets import (
            FLAGSHIP_ENV_KWARGS as _FK,
        )

        a_envs = 256 if on_tpu else 2
        a_steps = 100 if on_tpu else 5
        aenv = _TTC(**dict(
            _FK, num_taggers=20, num_runners=1004, grid_length=60.0,
            seed=0,
            knn_algorithm="pallas_flat_exact" if on_tpu else "ladder",
            knn_select="bf16pair"))
        aengine = EnvEngine(env_obj=aenv, num_envs=a_envs, seed=0)
        a_state = {k: v for k, v in aengine.state.items()
                   if k not in ("observations", "sampled_actions")}
        a_agents = aengine.n_agents
        a_heads = [int(n) for n in aenv.action_space[0].nvec]

        def a_env_step(carry, kk):
            st, checksum = carry
            k_act, k_reset = jax.random.split(kk)
            actions = jax.random.randint(
                k_act, (a_envs, a_agents, len(a_heads)),
                jnp.zeros((len(a_heads),), jnp.int32),
                jnp.asarray(a_heads, jnp.int32), dtype=jnp.int32)
            checksum = checksum + aengine.observe(st).sum()
            st = aengine.step_physics(st, actions)
            return aengine.auto_reset(st, k_reset), checksum

        a_stats = rollout_rate_stats(
            a_env_step, (a_state, jnp.zeros(())), a_steps, a_envs, key
        )
        a_rate = a_stats["value"]
        print(
            json.dumps(
                {
                    "metric": "tag_continuous_1024_agents_env_steps_per_sec",
                    **_disp(a_stats),
                    "unit": "env_steps/s",
                    "vs_baseline": round(a_rate / BASELINE_ENV_STEPS_PER_S, 4),
                    "num_envs": a_envs,
                    "knn_algorithm": aenv.knn_algorithm,
                    "num_agents": int(a_agents),
                    "agent_steps_per_sec": round(a_rate * a_agents),
                    "platform": platform,
                }
            ),
            flush=True,
        )
        print(f"[bench] 1024-agent Tag env-only: {a_rate:,.0f} env-steps/s "
              f"({a_rate * a_agents:,.0f} agent-steps/s)",
              file=sys.stderr, flush=True)
    except Exception as exc:
        print(f"[bench] 1024-agent stage failed: {exc}",
              file=sys.stderr, flush=True)

    # off-policy (DDPG) training throughput on Pendulum: the BASELINE
    # config left untold by earlier rounds — continuous actions, OU noise,
    # device-side replay, actor+critic+target updates in one fused program.
    # Round-4 env-count sweep (artifacts/round4/r4_ab4_results.jsonl):
    # throughput scales 6.4M @2K -> 29.2M @16K -> 43.8M @64K f32 and
    # flattens (45.0M @128K bf16); dtype is neutral on this tiny model,
    # so the stage runs the measured optimum E=64000 in plain f32.
    try:
        print("[bench] compiling + timing Pendulum DDPG training...",
              file=sys.stderr, flush=True)
        from warpdrive_tpu.training.scripts.train import setup_trainer
        from warpdrive_tpu.utils.config import load_run_config

        d_envs = 64000 if on_tpu else 16
        dcfg = load_run_config("single_pendulum")
        dcfg["trainer"]["num_envs"] = d_envs
        dcfg["trainer"]["train_batch_size"] = 100 * d_envs
        dcfg["trainer"]["num_episodes"] = 4 * d_envs
        dcfg["trainer"]["seed"] = 7
        dcfg["env"]["episode_length"] = 100
        dcfg["saving"] = {"metrics_log_freq": 10**9,
                          "model_params_save_freq": 10**9,
                          "basedir": "/tmp", "name": "bench_ddpg",
                          "tag": "t"}
        dtrainer = setup_trainer(dcfg, verbose=False)
        dprof = dtrainer.profile_phases(repeats=3)
        ddisp = _prof_disp(dprof)
        print(
            json.dumps(
                {
                    "metric": "pendulum_ddpg_training_env_steps_per_sec",
                    **ddisp,
                    "unit": "env_steps/s",
                    "vs_baseline": round(
                        ddisp["value"] / BASELINE_ENV_STEPS_PER_S, 4
                    ),
                    "rollout_ms": round(dprof["rollout_ms"], 2),
                    "update_ms": round(dprof["update_ms"], 2),
                    "num_envs": d_envs,
                    "platform": platform,
                }
            ),
            flush=True,
        )
    except Exception as exc:
        print(f"[bench] pendulum DDPG stage failed: {exc}",
              file=sys.stderr, flush=True)

    # flagship training throughput: the FULL two-policy adversarial A2C
    # iteration on TagContinuous at the reference's own config scale
    # (tag_continuous.yaml: 100 envs, 500-step episodes, 5 taggers + 100
    # runners) — rollout with packed-kNN observations + both policy updates
    # in one donated-carry program
    try:
        print("[bench] compiling + timing flagship training iteration...",
              file=sys.stderr, flush=True)
        from warpdrive_tpu.envs.engine import EnvEngine as _EE
        from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
        from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS
        from warpdrive_tpu.training.trainer_a2c import TrainerA2C as _TA2C

        f_envs = 100 if on_tpu else 8
        T_f = 500 if on_tpu else 20
        fenv = TpuTagContinuous(
            **dict(FLAGSHIP_ENV_KWARGS, seed=274880,
                   knn_algorithm="pallas_flat_exact",
                   knn_block_envs=4))
        fengine = _EE(env_obj=fenv, num_envs=f_envs, seed=31)
        pmap = {
            "tagger": [i for i in range(fenv.num_agents)
                       if fenv.agent_type[i] == 1],
            "runner": [i for i in range(fenv.num_agents)
                       if fenv.agent_type[i] == 0],
        }
        fpol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
                "entropy_coeff": 0.05, "clip_grad_norm": True,
                "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
                "model": {"type": "fully_connected",
                          "fc_dims": [256, 256]}}
        fcfg = {
            "name": "bench_flagship_train",
            "env": {},
            "trainer": {"num_envs": f_envs,
                        "num_episodes": 4 * f_envs,
                        "train_batch_size": T_f * f_envs, "seed": 1},
            "policy": {"runner": dict(fpol, lr=0.005),
                       "tagger": dict(fpol)},
            "saving": {"metrics_log_freq": 10**9,
                       "model_params_save_freq": 10**9,
                       "basedir": "/tmp", "name": "bench_f", "tag": "t"},
        }
        ftrainer = _TA2C(env_wrapper=fengine, config=fcfg,
                         policy_tag_to_agent_id_map=pmap, verbose=False)
        fprof = ftrainer.profile_phases(repeats=3)
        fdisp = _prof_disp(fprof)
        print(
            json.dumps(
                {
                    "metric":
                        "tag_continuous_training_env_steps_per_sec",
                    **fdisp,
                    "unit": "env_steps/s",
                    "vs_baseline": round(
                        fdisp["value"] / BASELINE_ENV_STEPS_PER_S, 4
                    ),
                    "rollout_ms": round(fprof["rollout_ms"], 2),
                    "update_ms": round(fprof["update_ms"], 2),
                    "num_envs": f_envs,
                    "platform": platform,
                }
            ),
            flush=True,
        )
    except Exception as exc:
        print(f"[bench] flagship training stage failed: {exc}",
              file=sys.stderr, flush=True)

    # tuned-scale flagship training: same two-policy adversarial system at
    # 2000 envs with the production tuning knobs (env-axis minibatched
    # update inside the jit + bf16 model compute/batch storage).  LAST
    # stage on purpose: it compiles the largest update program of the
    # suite, and a remote-compile failure here must not cost any earlier
    # line (they are already flushed).
    if not on_tpu:
        # re-emit the headline as the LAST stdout line too, so a parser
        # taking either the first or the last JSON line sees the same
        # north-star metric (the driver's parsing side is unspecified)
        print(json.dumps(headline), flush=True)
        return  # compile cost not worth it for the CPU smoke run
    try:
        print("[bench] compiling + timing tuned-scale flagship training...",
              file=sys.stderr, flush=True)
        t_envs2, T_2 = 2000, 100
        fenv2 = TpuTagContinuous(
            **dict(FLAGSHIP_ENV_KWARGS, seed=274880,
                   knn_algorithm="pallas_flat_exact",
                   knn_block_envs=4))
        fengine2 = _EE(env_obj=fenv2, num_envs=t_envs2, seed=31)
        pmap2 = {
            "tagger": [i for i in range(fenv2.num_agents)
                       if fenv2.agent_type[i] == 1],
            "runner": [i for i in range(fenv2.num_agents)
                       if fenv2.agent_type[i] == 0],
        }
        # mb400 + bf16 model/batch + fused output head: the round-4
        # minibatch ladder kept improving far past the pre-fusion sweep's
        # optimum — 5-env minibatches keep the per-mb activation set near
        # VMEM (r4_ab2b/ab2d/ab6: mb20 415 -> mb40 329 -> mb100 283 ->
        # mb400 210 ms update; mb1000/2000 regress on serial overhead;
        # the env-major relayout then took mb400 to 178 ms).  The
        # op-level trace (trace_update_mb20/) shows the update HBM-bound
        # at 650-760 GB/s — docs/performance.md §7b has the roofline.
        # LEARNING-VALIDATED (round 5, VERDICT r4 next #2): this EXACT
        # config — same kernel, E=2000, mb400, bf16, fused head — was
        # trained for 20M env-steps x 2 seeds against frozen-initial-
        # opponent cross-evals, alongside an mb8 control:
        # ALL FOUR ARMS LEARN (both policies improve vs their frozen
        # initial opponents in every arm), and the tuned-vs-control
        # tagger-gain gap is 0.25x the seed spread — inside seed
        # variance (artifacts/round5/r5_learncheck_fs3.jsonl; the
        # earlier fs2 run on the selection-identical "passes" obs path
        # agrees).  mb remains a per-policy knob; it is a different
        # optimizer-dynamics point than the reference's whole-batch
        # update.
        fpol2 = dict(fpol, num_minibatches=400, shuffle_minibatches=False,
                     model={"type": "fully_connected",
                            "fc_dims": [256, 256], "dtype": "bfloat16"})
        fcfg2 = {
            "name": "bench_flagship_tuned",
            "env": {},
            "trainer": {"num_envs": t_envs2, "num_episodes": 4 * t_envs2,
                        "train_batch_size": T_2 * t_envs2, "seed": 1,
                        "batch_dtype": "bfloat16"},
            "policy": {"runner": dict(fpol2, lr=0.005),
                       "tagger": dict(fpol2)},
            "saving": {"metrics_log_freq": 10**9,
                       "model_params_save_freq": 10**9,
                       "basedir": "/tmp", "name": "bench_ft", "tag": "t"},
        }
        ftr2 = _TA2C(env_wrapper=fengine2, config=fcfg2,
                     policy_tag_to_agent_id_map=pmap2, verbose=False)
        fprof2 = ftr2.profile_phases(repeats=3)
        fdisp2 = _prof_disp(fprof2)
        print(
            json.dumps(
                {
                    "metric":
                        "tag_continuous_training_tuned_env_steps_per_sec",
                    **fdisp2,
                    "unit": "env_steps/s",
                    "vs_baseline": round(
                        fdisp2["value"] / BASELINE_ENV_STEPS_PER_S, 4
                    ),
                    "rollout_ms": round(fprof2["rollout_ms"], 2),
                    "update_ms": round(fprof2["update_ms"], 2),
                    "num_envs": t_envs2,
                    "platform": platform,
                }
            ),
            flush=True,
        )
    except Exception as exc:
        print(f"[bench] tuned flagship training stage failed: {exc}",
              file=sys.stderr, flush=True)
    # headline repeated as the final stdout line (see the non-TPU branch)
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
