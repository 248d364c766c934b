"""Round-5 learning validation, part 2 (VERDICT r4 next #2): flagship
TagContinuous at the EXACT bench-tuned config (E=2000, T=100 batches,
mb400, bf16 model+batch, fused head) vs an mb8 CONTROL — same seeds,
~20M env-steps each, 2 seeds per arm.

"Learns" in the adversarial tag system = taggers catch runners: after
training, argmax-eval runner survival drops / tagger reward rises vs
the untrained policies.  The mb400-vs-mb8 comparison asks whether the
throughput-tuned optimizer regime (400 optimizer steps per batch over
5-env minibatches) reaches the same behavior class as the conservative
control within seed variance.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

print("devices:", jax.devices(), flush=True)
from warpdrive_tpu.envs.engine import EnvEngine  # noqa: E402
from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous  # noqa: E402
from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS  # noqa: E402
from warpdrive_tpu.training.trainer_a2c import TrainerA2C  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_learncheck_flagship.jsonl"


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


E, T, ITERS = 2000, 100, 100  # 20M env-steps per run


def run(num_minibatches, seed):
    env = TpuTagContinuous(**dict(FLAGSHIP_ENV_KWARGS, seed=274880))
    engine = EnvEngine(env_obj=env, num_envs=E, seed=31 + seed)
    pmap = {
        "tagger": [i for i in range(env.num_agents)
                   if env.agent_type[i] == 1],
        "runner": [i for i in range(env.num_agents)
                   if env.agent_type[i] == 0],
    }
    fpol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
            "entropy_coeff": 0.05, "clip_grad_norm": True,
            "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
            "num_minibatches": num_minibatches,
            "shuffle_minibatches": False,
            "model": {"type": "fully_connected", "fc_dims": [256, 256],
                      "dtype": "bfloat16"}}
    cfg = {
        "name": f"r5learn_fs_mb{num_minibatches}_s{seed}", "env": {},
        "trainer": {"num_envs": E, "num_episodes": ITERS * E * T // 500,
                    "train_batch_size": T * E, "seed": seed,
                    "batch_dtype": "bfloat16"},
        "policy": {"runner": dict(fpol, lr=0.005),
                   "tagger": dict(fpol)},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "r5learn_fs", "tag": "t"},
    }
    tr = TrainerA2C(env_wrapper=engine, config=cfg,
                    policy_tag_to_agent_id_map=pmap, verbose=False)

    def snapshot(tag):
        r, st = tr.evaluate_episodes(use_argmax=True)
        rec = {
            "stage": tag, "mb": num_minibatches, "seed": seed,
            "tagger_mean_reward": round(float(r["tagger"].mean()), 4),
            "runner_mean_reward": round(float(r["runner"].mean()), 4),
            "mean_episode_len": round(
                float(np.mean([v.mean() for v in st.values()])), 2),
        }
        log(rec)
        return rec

    b = snapshot("before")
    t0 = time.time()
    tr.train()
    log({"stage": "trained", "mb": num_minibatches, "seed": seed,
         "wall_s": round(time.time() - t0, 1),
         "env_steps": ITERS * E * T})
    a = snapshot("after")
    tr.graceful_close()
    return b, a


results = {}
for mb in (400, 8):
    for seed in (1, 2):
        try:
            b, a = run(mb, seed)
            results[(mb, seed)] = (b, a)
        except Exception as e:
            log({"stage": "error", "mb": mb, "seed": seed,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"})

# verdict: tagger reward must rise in every arm (taggers learn to tag);
# and the tuned arm's final tagger reward must sit within the control's
# behavior class (same sign of improvement, overlapping ranges given
# 2-seed spread)
try:
    def deltas(mb):
        return [results[(mb, s)][1]["tagger_mean_reward"]
                - results[(mb, s)][0]["tagger_mean_reward"]
                for s in (1, 2) if (mb, s) in results]

    d400, d8 = deltas(400), deltas(8)
    f400 = [results[(400, s)][1]["tagger_mean_reward"]
            for s in (1, 2) if (400, s) in results]
    f8 = [results[(8, s)][1]["tagger_mean_reward"]
          for s in (1, 2) if (8, s) in results]
    spread = max(max(f400) - min(f400), max(f8) - min(f8), 1e-9)
    gap = abs(float(np.mean(f400)) - float(np.mean(f8)))
    log({"stage": "verdict",
         "tuned_tagger_deltas": [round(x, 4) for x in d400],
         "control_tagger_deltas": [round(x, 4) for x in d8],
         "tuned_final": [round(x, 4) for x in f400],
         "control_final": [round(x, 4) for x in f8],
         "both_learn": bool(all(x > 0 for x in d400 + d8)),
         "gap_vs_seed_spread": round(gap / spread, 3)})
except Exception as e:
    log({"stage": "verdict_error", "error": str(e)[:300]})

print("LEARNCHECK_FS_DONE", flush=True)
