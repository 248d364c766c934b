"""
Round-3 TPU A/B #3: tuning the MXU kNN kernel (v3) + pricing exactness (v4).

Known from r3_ab2: pallas_mxu obs = 0.941 ms/pass @1000 envs (B=8), beats
XLA packed (1.009); pallas_mxu IN lax.scan works: 1051K env-steps/s.

Stages (flush-per-line to r3_ab3_results.jsonl):
  1. kernel_micro: knn_observation directly, chained inputs —
     B in {4, 8, 16, 32} x {mxu, mxu_exact}, plus raw_out=True at the
     best B (prices the output transpose).
  2. exactness: pallas_mxu_exact vs passes on a rolled state (expect 0).
  3. env_only scan @1000: pallas_mxu_exact (exact headline candidate).
  4. full_loop scan @1000: pallas_mxu + pallas_mxu_exact.
  5. train_profile E=2000 mb=20 bf16: pallas_mxu_exact (vs packed 269K).
"""

import json
import os
import sys
import time

RESULTS = os.environ.get(
    "AB3_RESULTS",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "r3_ab3_results.jsonl"),
)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def emit(obj):
    line = json.dumps(obj)
    print("[RESULT] " + line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("[ab3] acquiring device...", flush=True)
    dev = jax.devices()[0]
    print(f"[ab3] device acquired: {dev.platform} {dev}", flush=True)

    from warpdrive_tpu.presets import build_flagship, FLAGSHIP_ENV_KWARGS
    from warpdrive_tpu.ops.knn_obs import knn_observation
    from bench import rollout_rate

    key = jax.random.PRNGKey(321)
    E = int(os.environ.get("AB3_E", 1000))
    R = int(os.environ.get("AB3_R", 8))
    M = int(os.environ.get("AB3_M", 20))
    SCAN_T = int(os.environ.get("AB3_T", 500))

    print("[ab3] building rolled state...", flush=True)
    sys0 = build_flagship(num_envs=E, seed=0)
    env = sys0["env"]
    st0 = (sys0["state"], jnp.zeros(()))
    roll = jax.jit(lambda c, k: jax.lax.scan(
        lambda s, kk: (sys0["env_only_step"](s, kk), 0), c,
        jax.random.split(k, 50))[0])
    st0 = roll(st0, key)
    jax.block_until_ready(st0[0]["loc_x"])
    rolled = dict(st0[0])
    print("[ab3] rolled state ready", flush=True)

    from warpdrive_tpu.utils.constants import Constants
    N = env.num_agents
    k_nbr = env.num_other_agents_observed
    types_f = jnp.asarray(env.agent_types, dtype=jnp.float32)

    def kernel_inputs(state):
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
        return (
            state["loc_x"], state["loc_y"], feats, types_f,
            state["still_in_the_game"].astype(jnp.float32),
            (state[Constants.TIMESTEP] / env.episode_length
             ).astype(jnp.float32),
        )

    # ---------------- stage 1: kernel micro --------------------------------
    def kernel_micro(variant, B, raw):
        def chain(state):
            cs = jnp.zeros(())
            for _ in range(R):
                lx, ly, feats, tf, sf, tn = kernel_inputs(state)
                out = knn_observation(
                    lx, ly, feats, tf, sf, tn, n_agents=N, k=k_nbr,
                    block_envs=B, variant=variant, raw_out=raw)
                cs = out.sum() * np.float32(1e-20)
                state = dict(state)
                state["loc_x"] = state["loc_x"] + cs
            return state, cs

        fn = jax.jit(chain)
        state, cs = fn(dict(rolled))
        jax.block_until_ready(cs)
        t0 = time.perf_counter()
        for _ in range(M):
            state, cs = fn(state)
        jax.block_until_ready(cs)
        dt = time.perf_counter() - t0
        return dt / (R * M) * 1e3  # ms per obs pass

    best = ("mxu", 8, 1e9)
    for variant in ("mxu", "mxu_exact"):
        for B in (4, 8, 16, 32):
            try:
                t0 = time.time()
                ms = kernel_micro(variant, B, False)
                if variant == "mxu" and ms < best[2]:
                    best = (variant, B, ms)
                emit({"stage": "kernel_micro", "variant": variant,
                      "block_envs": B, "ms_per_pass": round(ms, 3),
                      "env_obs_per_sec": round(E / ms * 1e3),
                      "elapsed_s": round(time.time() - t0, 1)})
            except Exception as exc:
                emit({"stage": "kernel_micro", "variant": variant,
                      "block_envs": B,
                      "error": f"{type(exc).__name__}: {exc}"})
    try:
        t0 = time.time()
        ms = kernel_micro("mxu", best[1], True)
        emit({"stage": "kernel_micro", "variant": "mxu", "raw_out": True,
              "block_envs": best[1], "ms_per_pass": round(ms, 3),
              "env_obs_per_sec": round(E / ms * 1e3),
              "elapsed_s": round(time.time() - t0, 1)})
    except Exception as exc:
        emit({"stage": "kernel_micro", "raw_out": True,
              "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 2: exactness of mxu_exact ----------------------
    try:
        t0 = time.time()
        obs = {}
        E2 = min(E, 64)
        for algo in ("passes", "pallas_mxu_exact"):
            s2 = build_flagship(num_envs=E2, seed=0, knn_algorithm=algo,
                                knn_select="fused")
            sub = {k2: (v[:E2] if hasattr(v, "ndim") and v.ndim >= 1
                        and v.shape[0] == E else v)
                   for k2, v in rolled.items()}
            fn = jax.jit(lambda state, eng=s2["engine"]: eng.observe(state))
            obs[algo] = np.asarray(fn(sub))
        ref = obs["passes"]
        a = obs["pallas_mxu_exact"][:, :, :8 * k_nbr].reshape(E2, N, k_nbr, 8)
        b = ref[:, :, :8 * k_nbr].reshape(E2, N, k_nbr, 8)
        emit({"stage": "exactness", "slots_total": E2 * N * k_nbr,
              "mxu_exact_slot_deviations": int(
                  (np.abs(a - b) > 1e-4).any(axis=-1).sum()),
              "mxu_exact_max_abs": float(
                  np.abs(obs["pallas_mxu_exact"] - ref).max()),
              "elapsed_s": round(time.time() - t0, 1)})
    except Exception as exc:
        emit({"stage": "exactness", "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 3: env-only scan, mxu_exact --------------------
    try:
        t0 = time.time()
        s2 = build_flagship(num_envs=E, seed=0,
                            knn_algorithm="pallas_mxu_exact")
        r = rollout_rate(s2["env_only_step"], (s2["state"], jnp.zeros(())),
                         SCAN_T, E, key)
        emit({"stage": "env_only_1000", "algo": "pallas_mxu_exact",
              "env_steps_per_sec": round(r),
              "elapsed_s": round(time.time() - t0, 1)})
    except Exception as exc:
        emit({"stage": "env_only_1000", "algo": "pallas_mxu_exact",
              "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 4: full loop scans -----------------------------
    for algo in ("pallas_mxu", "pallas_mxu_exact"):
        try:
            t0 = time.time()
            s2 = build_flagship(num_envs=E, seed=0, knn_algorithm=algo)
            r = rollout_rate(s2["full_loop_step"], s2["state"], SCAN_T, E,
                             key, params=s2["params"])
            emit({"stage": "full_loop_1000", "algo": algo,
                  "env_steps_per_sec": round(r),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "full_loop_1000", "algo": algo,
                  "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 5: training profile with the kernel ------------
    try:
        t0 = time.time()
        from warpdrive_tpu.envs.engine import EnvEngine
        from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
        from warpdrive_tpu.training.trainer_a2c import TrainerA2C

        t_envs, T = 2000, 100
        fenv = TpuTagContinuous(
            **dict(FLAGSHIP_ENV_KWARGS, seed=274880,
                   knn_algorithm="pallas_mxu_exact"))
        fengine = EnvEngine(env_obj=fenv, num_envs=t_envs, seed=31)
        pmap = {
            "tagger": [i for i in range(fenv.num_agents)
                       if fenv.agent_type[i] == 1],
            "runner": [i for i in range(fenv.num_agents)
                       if fenv.agent_type[i] == 0],
        }
        fpol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
                "entropy_coeff": 0.05, "clip_grad_norm": True,
                "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
                "num_minibatches": 20, "shuffle_minibatches": False,
                "model": {"type": "fully_connected", "fc_dims": [256, 256],
                          "dtype": "bfloat16"}}
        fcfg = {
            "name": "ab3_train", "env": {},
            "trainer": {"num_envs": t_envs, "num_episodes": 4 * t_envs,
                        "train_batch_size": T * t_envs, "seed": 1,
                        "batch_dtype": "bfloat16"},
            "policy": {"runner": dict(fpol, lr=0.005),
                       "tagger": dict(fpol)},
            "saving": {"metrics_log_freq": 10**9,
                       "model_params_save_freq": 10**9,
                       "basedir": "/tmp", "name": "ab3", "tag": "t"},
        }
        tr = TrainerA2C(env_wrapper=fengine, config=fcfg,
                        policy_tag_to_agent_id_map=pmap, verbose=False)
        prof = tr.profile_phases(repeats=3)
        emit({"stage": "train_profile", "label": "pallas_mxu_exact_mb20",
              "steps_per_sec": round(prof["steps_per_sec"]),
              "rollout_ms": round(prof["rollout_ms"], 1),
              "update_ms": round(prof["update_ms"], 1),
              "elapsed_s": round(time.time() - t0, 1)})
    except Exception as exc:
        emit({"stage": "train_profile",
              "error": f"{type(exc).__name__}: {exc}"})

    emit({"stage": "done"})


if __name__ == "__main__":
    main()
