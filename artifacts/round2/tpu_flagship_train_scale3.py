"""Flagship 2000-env training: update-phase levers (remat off / bf16).

Stage-2 showed the ~1.1-1.4 s update is neither the minibatch gather
(shuffle ~= contiguous) nor amortization (more minibatches is FASTER).
Remaining suspects: the remat extra forward (unnecessary once
minibatching bounds activations) and f32 MXU rate. Variants at E=2000,
T=100, contiguous minibatches; one JSON line each, safest first.
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

    variants = (
        dict(num_mb=20, remat=False, dtype=None),
        dict(num_mb=20, remat=False, dtype="bfloat16"),
        dict(num_mb=40, remat=False, dtype=None),
        dict(num_mb=20, remat=True, dtype="bfloat16"),
    )
    for v in variants:
        model = {"type": "fully_connected", "fc_dims": [256, 256]}
        if v["dtype"]:
            model["dtype"] = v["dtype"]
        pol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
               "entropy_coeff": 0.05, "clip_grad_norm": True,
               "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
               "remat": v["remat"], "num_minibatches": v["num_mb"],
               "shuffle_minibatches": False, "model": model}
        cfg = {
            "name": "flagship_scale3",
            "env": {},
            "trainer": {"num_envs": n_envs, "num_episodes": 4 * n_envs,
                        "train_batch_size": T * n_envs, "seed": 1,
                        "batch_dtype": "bfloat16"},
            "policy": {"runner": dict(pol, lr=0.005), "tagger": dict(pol)},
            "saving": {"metrics_log_freq": 10**9,
                       "model_params_save_freq": 10**9,
                       "basedir": "/tmp", "name": "fscale3", "tag": "t"},
        }
        trainer = TrainerA2C(env_wrapper=engine, config=cfg,
                             policy_tag_to_agent_id_map=pmap, verbose=False)
        prof = trainer.profile_phases(repeats=3)
        emit(stage="flagship_train", num_envs=n_envs, T=T, **v,
             env_steps_per_s=round(prof["steps_per_sec"]),
             rollout_ms=round(prof["rollout_ms"], 1),
             update_ms=round(prof["update_ms"], 1),
             iteration_ms=round(prof["iteration_ms"], 1))
        del trainer

    emit(stage="done")


if __name__ == "__main__":
    main()
