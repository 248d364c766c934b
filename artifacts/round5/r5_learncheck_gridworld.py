"""Round-5 learning validation, part 1 (VERDICT r4 next #2): TagGridWorld
at the REAL bench config — E=32000, mb64, bf16 model+batch, fc[64,64] —
not the round-4 E=2000/mb4 proxy.  Short real train() (~130M env-steps);
argmax eval before vs after."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

print("devices:", jax.devices(), flush=True)
from warpdrive_tpu.envs.engine import EnvEngine  # noqa: E402
from warpdrive_tpu.envs.tag_gridworld import TpuTagGridWorld  # noqa: E402
from warpdrive_tpu.training.trainer_a2c import TrainerA2C  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_learncheck_gridworld.jsonl"


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


E, T, ITERS = 32000, 100, 40  # 128M env-steps
env = TpuTagGridWorld(num_taggers=4, grid_length=20, episode_length=T,
                      seed=7, use_full_observation=False)
engine = EnvEngine(env_obj=env, num_envs=E, seed=7)
cfg = {
    "name": "r5learn_gw", "env": {},
    "trainer": {"num_envs": E, "num_episodes": E * ITERS,
                "train_batch_size": E * T, "seed": 1,
                "batch_dtype": "bfloat16"},
    # EXACTLY the bench stage's policy config (bench.py gridworld
    # training stage): mb64, bf16 model, fc[64,64], lr 0.001
    "policy": {"shared": {"to_train": True, "gamma": 0.98, "lr": 0.001,
                          "num_minibatches": 64,
                          "shuffle_minibatches": False,
                          "model": {"type": "fully_connected",
                                    "fc_dims": [64, 64],
                                    "dtype": "bfloat16"}}},
    "saving": {"metrics_log_freq": 10, "model_params_save_freq": 10**9,
               "basedir": "/tmp", "name": "r5learn_gw", "tag": "t"},
}
tr = TrainerA2C(env_wrapper=engine, config=cfg, verbose=False)


def snapshot(tag):
    r, st = tr.evaluate_episodes(use_argmax=True)
    rew = r["shared"]  # (E, 5): agents 0-3 taggers, 4 runner
    rec = {
        "stage": tag,
        "tagger_mean_reward": round(float(rew[:, :4].mean()), 3),
        "runner_mean_reward": round(float(rew[:, 4].mean()), 3),
        "mean_episode_len": round(float(st["shared"].mean()), 2),
    }
    log(rec)
    return rec


b = snapshot("before")
t0 = time.time()
tr.train()
log({"stage": "trained", "wall_s": round(time.time() - t0, 1),
     "env_steps": E * ITERS * T, "num_minibatches": 64, "num_envs": E})
a = snapshot("after")
log({"stage": "verdict",
     "tagger_improved": bool(
         a["tagger_mean_reward"] > b["tagger_mean_reward"]),
     "episodes_shorter": bool(
         a["mean_episode_len"] < b["mean_episode_len"])})
tr.graceful_close()
print("LEARNCHECK_GW_DONE", flush=True)
