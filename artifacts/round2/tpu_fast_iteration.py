"""Measure the metrics-free hot iteration on the chip.

After the anatomy7 finding (keeping loss/metric values as outputs costs
2.25x), trainers compile a metrics-free twin used off log points.
Re-measure flagship TagContinuous (E=2000, T=100, mb=20, bf16, no remat)
and the TagGridWorld bench config (E=2000) with profile_phases, which
now times the hot program.
"""

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit(stage="start", platform=jax.devices()[0].platform)

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
    from warpdrive_tpu.envs.tag_gridworld import TpuTagGridWorld
    from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    # ---- flagship TagContinuous ----
    T, n_envs = 100, 2000
    env = TpuTagContinuous(
        **dict(FLAGSHIP_ENV_KWARGS, seed=274880, knn_algorithm="packed")
    )
    engine = EnvEngine(env_obj=env, num_envs=n_envs, seed=31)
    pmap = {
        "tagger": [i for i in range(env.num_agents)
                   if env.agent_type[i] == 1],
        "runner": [i for i in range(env.num_agents)
                   if env.agent_type[i] == 0],
    }
    pol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
           "entropy_coeff": 0.05, "clip_grad_norm": True,
           "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
           "remat": False, "num_minibatches": 20,
           "shuffle_minibatches": False,
           "model": {"type": "fully_connected", "fc_dims": [256, 256],
                     "dtype": "bfloat16"}}
    cfg = {
        "name": "fastiter",
        "env": {},
        "trainer": {"num_envs": n_envs, "num_episodes": 4 * n_envs,
                    "train_batch_size": T * n_envs, "seed": 1,
                    "batch_dtype": "bfloat16"},
        "policy": {"runner": dict(pol, lr=0.005), "tagger": dict(pol)},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "fastiter", "tag": "t"},
    }
    tr = TrainerA2C(env_wrapper=engine, config=cfg,
                    policy_tag_to_agent_id_map=pmap, verbose=False)
    prof = tr.profile_phases(repeats=3)
    emit(stage="flagship_train_fast", num_envs=n_envs, T=T,
         env_steps_per_s=round(prof["steps_per_sec"]),
         rollout_ms=round(prof["rollout_ms"], 1),
         update_ms=round(prof["update_ms"], 1),
         iteration_ms=round(prof["iteration_ms"], 1))
    del tr, engine, env

    # ---- TagGridWorld at bench scale ----
    t_envs, T_g = 2000, 100
    genv = TpuTagGridWorld(
        num_taggers=4, grid_length=20, episode_length=100, seed=7,
        use_full_observation=False,
    )
    gengine = EnvEngine(env_obj=genv, num_envs=t_envs, seed=7)
    gcfg = {
        "name": "fastiter_grid",
        "env": {},
        "trainer": {"num_envs": t_envs,
                    "num_episodes": 4 * T_g * t_envs // 100,
                    "train_batch_size": T_g * t_envs, "seed": 1},
        "policy": {"shared": {"to_train": True, "gamma": 0.98,
                              "lr": 0.001,
                              "model": {"type": "fully_connected",
                                        "fc_dims": [64, 64]}}},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "fastiter_g", "tag": "t"},
    }
    gtr = TrainerA2C(env_wrapper=gengine, config=gcfg, verbose=False)
    gprof = gtr.profile_phases(repeats=3)
    emit(stage="gridworld_train_fast", num_envs=t_envs, T=T_g,
         env_steps_per_s=round(gprof["steps_per_sec"]),
         rollout_ms=round(gprof["rollout_ms"], 1),
         update_ms=round(gprof["update_ms"], 1),
         iteration_ms=round(gprof["iteration_ms"], 1))

    emit(stage="done")


if __name__ == "__main__":
    main()
