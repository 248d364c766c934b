"""Flagship training-throughput scaling on the chip.

profile_phases for num_envs in {100, 200, 400} x remat {off, on} (400
without remat OOMs: the update stores (T, E, N, 256) activations).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from artifacts.round2.tpu_tag_continuous_train import make_config  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax

    emit(stage="start", platform=jax.devices()[0].platform)
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    for num_envs, remat in [(100, False), (100, True), (200, True),
                            (400, True)]:
        try:
            cfg = make_config(num_envs, 10)
            for tag in cfg["policy"]:
                cfg["policy"][tag]["remat"] = remat
            cfg["trainer"].pop("evaluator", None)
            env = TpuTagContinuous(**cfg["env"])
            engine = EnvEngine(env_obj=env, num_envs=num_envs, seed=31)
            pmap = {
                "tagger": [i for i in range(env.num_agents)
                           if env.agent_type[i] == 1],
                "runner": [i for i in range(env.num_agents)
                           if env.agent_type[i] == 0],
            }
            trainer = TrainerA2C(env_wrapper=engine, config=cfg,
                                 policy_tag_to_agent_id_map=pmap,
                                 verbose=False)
            prof = trainer.profile_phases(repeats=3)
            emit(stage="profile", num_envs=num_envs, remat=remat,
                 steps_per_sec=round(prof["steps_per_sec"]),
                 rollout_ms=round(prof["rollout_ms"], 2),
                 update_ms=round(prof["update_ms"], 2))
            del trainer, engine
        except Exception as e:  # noqa: BLE001
            emit(stage="profile", num_envs=num_envs, remat=remat,
                 error=f"{type(e).__name__}: {e}"[:300])
    emit(stage="done")


if __name__ == "__main__":
    main()
