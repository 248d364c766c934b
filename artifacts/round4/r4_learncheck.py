"""Round-4 learning sanity on chip: the high-minibatch tuned configs
must LEARN, not just run fast.  Short real train() runs; evaluate
(argmax) before vs after."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax
print("devices:", jax.devices(), flush=True)
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.envs.tag_gridworld import TpuTagGridWorld
from warpdrive_tpu.training.trainer_a2c import TrainerA2C

OUT = "/root/repo/artifacts/round4/r4_learncheck.jsonl"

def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")

# bench-tuned per-mb geometry: 32000 envs / mb64 = 500 envs per
# minibatch; this run keeps 500 envs/mb at E=2000 (mb4), 400 iterations
env = TpuTagGridWorld(num_taggers=4, grid_length=20, episode_length=100,
                      seed=7, use_full_observation=False)
engine = EnvEngine(env_obj=env, num_envs=2000, seed=7)
cfg = {
    "name": "r4learn", "env": {},
    "trainer": {"num_envs": 2000, "num_episodes": 2000 * 400,
                "train_batch_size": 200000, "seed": 1,
                "batch_dtype": "bfloat16"},
    "policy": {"shared": {"to_train": True, "gamma": 0.98, "lr": 0.001,
                          "num_minibatches": 4,
                          "shuffle_minibatches": False,
                          "model": {"type": "fully_connected",
                                    "fc_dims": [64, 64],
                                    "dtype": "bfloat16"}}},
    "saving": {"metrics_log_freq": 100, "model_params_save_freq": 10**9,
               "basedir": "/tmp", "name": "r4learn", "tag": "t"},
}
import numpy as np
tr = TrainerA2C(env_wrapper=engine, config=cfg, verbose=False)

def snapshot(tag):
    r, st = tr.evaluate_episodes(use_argmax=True)
    rew = r["shared"]  # (E, 5): agents 0-3 taggers, 4 runner
    return {
        "stage": tag,
        "tagger_mean_reward": round(float(rew[:, :4].mean()), 3),
        "runner_mean_reward": round(float(rew[:, 4].mean()), 3),
        "mean_episode_len": round(float(st["shared"].mean()), 2),
    }

b = snapshot("before"); log(b)
t0 = time.time()
tr.train()
log({"stage": "trained", "wall_s": round(time.time() - t0, 1),
     "env_steps": 2000 * 400 * 100})
a = snapshot("after"); log(a)
# taggers (4/5 of the shared policy's agents) should learn to tag:
# higher tagger reward and shorter episodes
log({"stage": "verdict",
     "tagger_improved": bool(a["tagger_mean_reward"] > b["tagger_mean_reward"]),
     "episodes_shorter": bool(a["mean_episode_len"] < b["mean_episode_len"])})
tr.graceful_close()
print("LEARNCHECK_DONE", flush=True)
