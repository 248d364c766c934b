"""Round-4 A/B #5b: gridworld 32K (the confirmed optimum env count,
ab5: 64K regressed 12.15M -> 11.36M) minibatch sweep with the fused
head.  Control: mb4 = 12.15M."""
import json, time, sys
import jax
print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.envs.tag_gridworld import TpuTagGridWorld
from warpdrive_tpu.training.trainer_a2c import TrainerA2C

OUT = "/root/repo/artifacts/round4/r4_ab5_results.jsonl"


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def measure(t_envs, mb, bdt="bfloat16", mdt="bfloat16", T_train=100):
    env = TpuTagGridWorld(
        num_taggers=4, grid_length=20, episode_length=100, seed=7,
        use_full_observation=False,
    )
    engine = EnvEngine(env_obj=env, num_envs=t_envs, seed=7)
    cfg = {
        "name": "r4ab5b",
        "env": {},
        "trainer": {
            "num_envs": t_envs,
            "num_episodes": 4 * T_train * t_envs // 100,
            "train_batch_size": T_train * t_envs,
            "seed": 1,
            "batch_dtype": bdt,
        },
        "policy": {"shared": {"to_train": True, "gamma": 0.98,
                              "lr": 0.001,
                              "num_minibatches": mb,
                              "shuffle_minibatches": False,
                              "model": {"type": "fully_connected",
                                        "fc_dims": [64, 64],
                                        **({"dtype": mdt}
                                           if mdt != "float32" else {})}}},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "r4ab5b", "tag": "t"},
    }
    t0 = time.time()
    trainer = TrainerA2C(env_wrapper=engine, config=cfg, verbose=False)
    prof = trainer.profile_phases(repeats=3)
    log({"num_envs": t_envs, "num_minibatches": mb, "batch_dtype": bdt,
         "model_dtype": mdt,
         "steps_per_sec": round(prof["steps_per_sec"]),
         "rollout_ms": round(prof["rollout_ms"], 2),
         "update_ms": round(prof["update_ms"], 2),
         "wall_s": round(time.time() - t0, 1)})
    trainer.graceful_close()


for t_envs, mb in [(32000, 2), (32000, 8), (32000, 1), (32000, 16)]:
    try:
        measure(t_envs, mb)
    except Exception as e:
        log({"num_envs": t_envs, "num_minibatches": mb,
             "error": f"{type(e).__name__}: {e}"[:300]})
print("AB5B_DONE", flush=True)
