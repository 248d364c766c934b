"""
Round-3 TPU A/B #1: approx_min_k kNN observe + update_recompute_obs trainer.

Stages (each flushes one JSON line to r3_ab1_results.jsonl immediately):
  1. exactness: approx/packed vs passes slot agreement on a rolled state
  2. env-only rollout rates @1000 envs: packed+bf16pair (r2 control),
     approx+bf16pair, approx+fused
  3. env-count sweep for the approx winner (2000, 4000)
  4. full loop @1000 for the winner
  5. flagship training profiles (E=2000, T=100, mb=20, bf16):
     packed+store (r2 control), winner+store, winner+recompute
  6. 1024-agent TagContinuous env-only feasibility (E=16, approx)

Results saved BEFORE any trailing compile (CLAUDE.md rule 6).
"""

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r3_ab1_results.jsonl")
# repo root on sys.path for `from bench import rollout_rate` (sys.path[0]
# is the script dir, artifacts/round3, when launched as a file)
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

    print("[ab1] acquiring device...", flush=True)
    dev = jax.devices()[0]
    print(f"[ab1] device acquired: {dev.platform} {dev}", flush=True)

    from warpdrive_tpu.presets import build_flagship, FLAGSHIP_ENV_KWARGS
    from bench import rollout_rate

    key = jax.random.PRNGKey(42)

    # ---------------- stage 1: exactness of approx on a rolled state ------
    try:
        t0 = time.time()
        E0 = 64
        sys_ref = build_flagship(num_envs=E0, seed=0, knn_algorithm="passes",
                                 knn_select="fused")
        # roll 50 random steps to a realistic mid-episode state
        st = (sys_ref["state"], jnp.zeros(()))
        roll = jax.jit(lambda c, k: jax.lax.scan(
            lambda s, kk: (sys_ref["env_only_step"](s, kk), 0),
            c, jax.random.split(k, 50))[0])
        st = roll(st, key)
        jax.block_until_ready(st[0]["loc_x"])
        rolled = st[0]

        obs = {}
        for algo, sel in [("passes", "fused"), ("ladder", "fused"),
                          ("packed", "fused"), ("approx", "fused"),
                          ("approx", "bf16pair")]:
            s2 = build_flagship(num_envs=E0, seed=0, knn_algorithm=algo,
                                knn_select=sel)
            fn = jax.jit(lambda state, eng=s2["engine"]: eng.observe(state))
            obs[(algo, sel)] = np.asarray(fn(rolled))
        ref = obs[("passes", "fused")]
        N = sys_ref["num_agents"]
        k_nbr = FLAGSHIP_ENV_KWARGS["num_other_agents_observed"]
        slots_total = E0 * N * k_nbr
        out = {"stage": "exactness", "slots_total": slots_total,
               "elapsed_s": round(time.time() - t0, 1)}
        for (algo, sel), o in obs.items():
            if algo == "passes":
                continue
            # slot-major: compare per-slot blocks (8 feats each)
            a = o[:, :, :8 * k_nbr].reshape(E0, N, k_nbr, 8)
            b = ref[:, :, :8 * k_nbr].reshape(E0, N, k_nbr, 8)
            slot_diff = int((np.abs(a - b) > 1e-4).any(axis=-1).sum())
            max_abs = float(np.abs(o - ref).max())
            out[f"{algo}_{sel}_slot_deviations"] = slot_diff
            out[f"{algo}_{sel}_max_abs"] = max_abs
        emit(out)
    except Exception as exc:
        emit({"stage": "exactness", "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 2: env-only rates @1000 ------------------------
    rates = {}
    for algo, sel in [("packed", "bf16pair"), ("approx", "bf16pair"),
                      ("approx", "fused")]:
        try:
            t0 = time.time()
            sys_ = build_flagship(num_envs=1000, seed=0, knn_algorithm=algo,
                                  knn_select=sel)
            r = rollout_rate(sys_["env_only_step"],
                             (sys_["state"], jnp.zeros(())), 500, 1000, key)
            rates[(algo, sel)] = r
            emit({"stage": "env_only_1000", "algo": algo, "select": sel,
                  "env_steps_per_sec": round(r),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "env_only_1000", "algo": algo, "select": sel,
                  "error": f"{type(exc).__name__}: {exc}"})

    best = max(rates, key=rates.get) if rates else ("packed", "bf16pair")
    emit({"stage": "winner", "algo": best[0], "select": best[1],
          "env_steps_per_sec": round(rates.get(best, 0))})

    # ---------------- stage 3: env sweep for the winner --------------------
    for E in (2000, 4000):
        try:
            t0 = time.time()
            sys_ = build_flagship(num_envs=E, seed=0, knn_algorithm=best[0],
                                  knn_select=best[1])
            r = rollout_rate(sys_["env_only_step"],
                             (sys_["state"], jnp.zeros(())), 500, E, key)
            emit({"stage": "env_sweep", "algo": best[0], "select": best[1],
                  "num_envs": E, "env_steps_per_sec": round(r),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "env_sweep", "num_envs": E,
                  "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 4: full loop @1000 for the winner --------------
    try:
        t0 = time.time()
        sys_ = build_flagship(num_envs=1000, seed=0, knn_algorithm=best[0],
                              knn_select=best[1])
        r = rollout_rate(sys_["full_loop_step"], sys_["state"], 500, 1000,
                         key, params=sys_["params"])
        emit({"stage": "full_loop_1000", "algo": best[0], "select": best[1],
              "env_steps_per_sec": round(r),
              "elapsed_s": round(time.time() - t0, 1)})
    except Exception as exc:
        emit({"stage": "full_loop_1000",
              "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 5: flagship training profiles ------------------
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    def train_profile(algo, sel, recompute, num_mb=20, t_envs=2000, T=100):
        fenv = TpuTagContinuous(
            **dict(FLAGSHIP_ENV_KWARGS, seed=274880, knn_algorithm=algo,
                   knn_select=sel))
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
                "num_minibatches": num_mb, "shuffle_minibatches": False,
                "model": {"type": "fully_connected", "fc_dims": [256, 256],
                          "dtype": "bfloat16"}}
        fcfg = {
            "name": "ab1_train", "env": {},
            "trainer": {"num_envs": t_envs, "num_episodes": 4 * t_envs,
                        "train_batch_size": T * t_envs, "seed": 1,
                        "batch_dtype": "bfloat16",
                        "update_recompute_obs": recompute},
            "policy": {"runner": dict(fpol, lr=0.005),
                       "tagger": dict(fpol)},
            "saving": {"metrics_log_freq": 10**9,
                       "model_params_save_freq": 10**9,
                       "basedir": "/tmp", "name": "ab1", "tag": "t"},
        }
        tr = TrainerA2C(env_wrapper=fengine, config=fcfg,
                        policy_tag_to_agent_id_map=pmap, verbose=False)
        return tr.profile_phases(repeats=3)

    for label, algo, sel, rec, mb in [
        ("packed_store_mb20", "packed", "bf16pair", False, 20),
        (f"{best[0]}_store_mb20", best[0], best[1], False, 20),
        (f"{best[0]}_recompute_mb20", best[0], best[1], True, 20),
        (f"{best[0]}_recompute_mb4", best[0], best[1], True, 4),
    ]:
        try:
            t0 = time.time()
            prof = train_profile(algo, sel, rec, num_mb=mb)
            emit({"stage": "train_profile", "label": label,
                  "steps_per_sec": round(prof["steps_per_sec"]),
                  "rollout_ms": round(prof["rollout_ms"], 1),
                  "update_ms": round(prof["update_ms"], 1),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "train_profile", "label": label,
                  "error": f"{type(exc).__name__}: {exc}"})

    # ---------------- stage 6: 1024-agent feasibility ----------------------
    try:
        t0 = time.time()
        from warpdrive_tpu.presets import build_flagship as _bf
        # 1024 agents: 20 taggers + 1004 runners, k=10
        import warpdrive_tpu.presets as presets
        kwargs = dict(FLAGSHIP_ENV_KWARGS, num_taggers=20, num_runners=1004,
                      grid_length=60.0, seed=0, knn_algorithm="approx",
                      knn_select="bf16pair")
        env = TpuTagContinuous(**kwargs)
        eng = EnvEngine(env_obj=env, num_envs=16, seed=0)
        state = {k: v for k, v in eng.state.items()
                 if k not in ("observations", "sampled_actions")}
        n_agents = eng.n_agents
        heads = [int(n) for n in env.action_space[0].nvec]

        def env_only(carry, kk):
            st, checksum = carry
            k_act, k_reset = jax.random.split(kk)
            mins = jnp.zeros((len(heads),), dtype=jnp.int32)
            maxs = jnp.asarray(heads, dtype=jnp.int32)
            actions = jax.random.randint(
                k_act, (16, n_agents, len(heads)), mins, maxs,
                dtype=jnp.int32)
            checksum = checksum + eng.observe(st).sum()
            st = eng.step_physics(st, actions)
            return eng.auto_reset(st, k_reset), checksum

        r = rollout_rate(env_only, (state, jnp.zeros(())), 200, 16, key)
        emit({"stage": "agents1024_env_only", "num_envs": 16,
              "num_agents": int(n_agents),
              "env_steps_per_sec": round(r),
              "agent_steps_per_sec": round(r * n_agents),
              "elapsed_s": round(time.time() - t0, 1)})
    except Exception as exc:
        emit({"stage": "agents1024_env_only",
              "error": f"{type(exc).__name__}: {exc}"})

    emit({"stage": "done"})


if __name__ == "__main__":
    main()
