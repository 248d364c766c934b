"""Flagship TagContinuous training at >100 envs on the chip.

Round-2 open thread: >=200-env flagship update programs used to crash the
remote AOT compile helper (the unrolled per-minibatch update bodies made
the program huge). With the update's epoch x minibatch sweep now a single
lax.scan over an index table, ramp the env count and measure the full
two-policy A2C iteration (profile_phases: rollout/update breakdown).

Config per scale: T=100 steps/iteration-batch, minibatches sized to 100
envs each, remat on both policies, bfloat16 stored obs batch. Results
flush one JSON line per scale so a wedge at the largest scale cannot lose
the smaller ones.
"""

import json
import sys
import time

import jax

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit(stage="start", platform=jax.devices()[0].platform)

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
    from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    T = 100
    for n_envs in (400, 1000, 2000):
        num_mb = max(1, n_envs // 100)
        t_build = time.perf_counter()
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
               "remat": True, "num_minibatches": num_mb,
               "model": {"type": "fully_connected", "fc_dims": [256, 256]}}
        cfg = {
            "name": "flagship_scale",
            "env": {},
            "trainer": {"num_envs": n_envs, "num_episodes": 4 * n_envs,
                        "train_batch_size": T * n_envs, "seed": 1,
                        "batch_dtype": "bfloat16"},
            "policy": {"runner": dict(pol, lr=0.005), "tagger": dict(pol)},
            "saving": {"metrics_log_freq": 10**9,
                       "model_params_save_freq": 10**9,
                       "basedir": "/tmp", "name": "fscale", "tag": "t"},
        }
        trainer = TrainerA2C(env_wrapper=engine, config=cfg,
                             policy_tag_to_agent_id_map=pmap, verbose=False)
        emit(stage="built", num_envs=n_envs, num_minibatches=num_mb,
             build_s=round(time.perf_counter() - t_build, 1))
        prof = trainer.profile_phases(repeats=3)
        emit(stage="flagship_train", num_envs=n_envs, T=T,
             num_minibatches=num_mb,
             env_steps_per_s=round(prof["steps_per_sec"]),
             rollout_ms=round(prof["rollout_ms"], 1),
             update_ms=round(prof["update_ms"], 1),
             iteration_ms=round(prof["iteration_ms"], 1))
        del trainer, engine, env

    emit(stage="done")


if __name__ == "__main__":
    main()
