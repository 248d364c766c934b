"""Round-5 capstone: a 100 M-env-step flagship training run at the
EXACT bench-tuned config (E=2000, mb400, bf16, fused head, env-major),
with frozen-opponent cross-evaluations at 0 / 20 / 60 / 100 M env-steps.

At the round-5 tuned-training rate (~488 K env-steps/s) this is ~3.5
minutes of device time for the volume the round-2 capstone needed ~20
minutes for — and unlike a self-play reward curve, the cross-eval
series is monotone-interpretable (each point: the current tagger policy
vs the FROZEN INITIAL runner, and vice versa).
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

OUT = "/root/repo/artifacts/round5/r5_longrun_flagship.jsonl"


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


E, T = 2000, 100
SEGMENTS = [(100, "20M"), (200, "60M"), (200, "100M")]  # iters per leg

env = TpuTagContinuous(**dict(FLAGSHIP_ENV_KWARGS, seed=274880))
engine = EnvEngine(env_obj=env, num_envs=E, seed=31)
pmap = {
    "tagger": [i for i in range(env.num_agents) if env.agent_type[i] == 1],
    "runner": [i for i in range(env.num_agents) if env.agent_type[i] == 0],
}
fpol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
        "entropy_coeff": 0.05, "clip_grad_norm": True,
        "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
        "num_minibatches": 400, "shuffle_minibatches": False,
        "model": {"type": "fully_connected", "fc_dims": [256, 256],
                  "dtype": "bfloat16"}}


def make_trainer(iters):
    cfg = {
        "name": "r5long", "env": {},
        "trainer": {"num_envs": E, "num_episodes": iters * E * T // 500,
                    "train_batch_size": T * E, "seed": 11,
                    "batch_dtype": "bfloat16"},
        "policy": {"runner": dict(fpol, lr=0.005), "tagger": dict(fpol)},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "r5long", "tag": "t"},
    }
    return TrainerA2C(env_wrapper=engine, config=cfg,
                      policy_tag_to_agent_id_map=pmap, verbose=False)


tr = make_trainer(SEGMENTS[0][0])
p0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                            tr._carry["params"])


def cross_eval(tag):
    pT = tr._carry["params"]

    def ev(params):
        saved = tr._carry["params"]
        tr._carry = dict(tr._carry)
        tr._carry["params"] = params
        r, _ = tr.evaluate_episodes(use_argmax=True)
        tr._carry["params"] = saved
        return (round(float(r["tagger"].mean()), 3),
                round(float(r["runner"].mean()), 3))

    tvf = ev({"tagger": pT["tagger"], "runner": p0["runner"]})
    rvf = ev({"tagger": p0["tagger"], "runner": pT["runner"]})
    sp = ev(pT)
    log({"stage": tag,
         "tagger_vs_frozen_runner": {"tagger_rew": tvf[0],
                                     "runner_rew": tvf[1]},
         "frozen_tagger_vs_runner": {"tagger_rew": rvf[0],
                                     "runner_rew": rvf[1]},
         "self_play": {"tagger_rew": sp[0], "runner_rew": sp[1]}})


cross_eval("steps_0")
total_steps = 0
t_train = 0.0
for iters, label in SEGMENTS:
    # fresh trainer config per leg (num_iters is baked into train());
    # carry (params + opt state + env state) carries over
    carry = tr._carry
    tr = make_trainer(iters)
    tr._carry = carry
    t0 = time.time()
    tr.train()
    t_train += time.time() - t0
    total_steps += iters * E * T
    log({"stage": "trained", "through": label,
         "total_env_steps": total_steps,
         "train_wall_s": round(t_train, 1)})
    cross_eval(f"steps_{label}")

log({"stage": "done", "total_env_steps": total_steps,
     "train_wall_s": round(t_train, 1),
     "avg_steps_per_sec": round(total_steps / t_train)})
tr.graceful_close()
print("LONGRUN_DONE", flush=True)
