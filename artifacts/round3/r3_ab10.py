"""
Round-3 TPU A/B #10: TagGridWorld A2C training throughput — env-count
sweep + phase breakdown (bench r3: 16.2 M env-only vs 4.68 M training at
E=2000; where do the other 0.22 ms/step of rollout go, and does a larger
fleet amortize them?)
"""

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r3_ab10_results.jsonl")
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

    print("[ab10] acquiring device...", flush=True)
    dev = jax.devices()[0]
    print(f"[ab10] device acquired: {dev.platform}", flush=True)

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_gridworld import TpuTagGridWorld
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    def profile(t_envs, T=100, batch_dtype="float32", model_dtype=None,
                num_mb=1):
        env = TpuTagGridWorld(
            num_taggers=4, grid_length=20, episode_length=100, seed=7,
            use_full_observation=False,
        )
        engine = EnvEngine(env_obj=env, num_envs=t_envs, seed=7)
        model = {"type": "fully_connected", "fc_dims": [64, 64]}
        if model_dtype:
            model["dtype"] = model_dtype
        pol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
               "entropy_coeff": 0.05, "clip_grad_norm": True,
               "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
               "num_minibatches": num_mb, "shuffle_minibatches": False,
               "model": model}
        cfg = {
            "name": "ab10", "env": {},
            "trainer": {"num_envs": t_envs, "num_episodes": 4 * t_envs,
                        "train_batch_size": T * t_envs, "seed": 1,
                        "batch_dtype": batch_dtype},
            "policy": {"shared": pol},
            "saving": {"metrics_log_freq": 10**9,
                       "model_params_save_freq": 10**9,
                       "basedir": "/tmp", "name": "ab10", "tag": "t"},
        }
        tr = TrainerA2C(env_wrapper=engine, config=cfg,
                        policy_tag_to_agent_id_map={
                            "shared": list(range(env.num_agents))},
                        verbose=False)
        return tr.profile_phases(repeats=3)

    for label, kw in [
        ("E2000_f32", dict(t_envs=2000)),
        ("E8000_f32", dict(t_envs=8000)),
        ("E16000_f32", dict(t_envs=16000)),
        ("E8000_bf16model", dict(t_envs=8000, model_dtype="bfloat16")),
        ("E16000_bf16model_bf16batch",
         dict(t_envs=16000, model_dtype="bfloat16",
              batch_dtype="bfloat16")),
        ("E32000_bf16model_bf16batch_mb4",
         dict(t_envs=32000, model_dtype="bfloat16",
              batch_dtype="bfloat16", num_mb=4)),
    ]:
        try:
            t0 = time.time()
            prof = profile(**kw)
            emit({"stage": "gridworld_train", "label": label,
                  "steps_per_sec": round(prof["steps_per_sec"]),
                  "rollout_steps_per_sec":
                      round(prof["rollout_steps_per_sec"]),
                  "rollout_ms": round(prof["rollout_ms"], 2),
                  "update_ms": round(prof["update_ms"], 2),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "gridworld_train", "label": label,
                  "error": f"{type(exc).__name__}: {exc}"})

    emit({"stage": "done"})


if __name__ == "__main__":
    main()
