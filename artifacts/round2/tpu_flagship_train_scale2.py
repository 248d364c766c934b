"""Flagship 2000-env training: minibatch slicing mode + count sweep.

Stage-1 (tpu_flagship_train_scale.log) showed the update at 2000 envs
costs 1102 ms vs a 350 ms rollout with num_mb=20 shuffled minibatches.
Hypothesis: the per-minibatch env-axis jnp.take (gather) dominates.
Variants here use shuffle_minibatches=False (contiguous dynamic_slice
blocks) and sweep the minibatch count. One JSON line per variant,
safest (smallest minibatch) first.
"""

import json
import sys

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

    for num_mb, shuffle in ((20, False), (10, False), (5, False),
                            (10, True)):
        pol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
               "entropy_coeff": 0.05, "clip_grad_norm": True,
               "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
               "remat": True, "num_minibatches": num_mb,
               "shuffle_minibatches": shuffle,
               "model": {"type": "fully_connected", "fc_dims": [256, 256]}}
        cfg = {
            "name": "flagship_scale2",
            "env": {},
            "trainer": {"num_envs": n_envs, "num_episodes": 4 * n_envs,
                        "train_batch_size": T * n_envs, "seed": 1,
                        "batch_dtype": "bfloat16"},
            "policy": {"runner": dict(pol, lr=0.005), "tagger": dict(pol)},
            "saving": {"metrics_log_freq": 10**9,
                       "model_params_save_freq": 10**9,
                       "basedir": "/tmp", "name": "fscale2", "tag": "t"},
        }
        trainer = TrainerA2C(env_wrapper=engine, config=cfg,
                             policy_tag_to_agent_id_map=pmap, verbose=False)
        prof = trainer.profile_phases(repeats=3)
        emit(stage="flagship_train", num_envs=n_envs, T=T,
             num_minibatches=num_mb, shuffle=shuffle,
             env_steps_per_s=round(prof["steps_per_sec"]),
             rollout_ms=round(prof["rollout_ms"], 1),
             update_ms=round(prof["update_ms"], 1),
             iteration_ms=round(prof["iteration_ms"], 1))
        del trainer

    emit(stage="done")


if __name__ == "__main__":
    main()
