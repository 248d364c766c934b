"""Round-5 capstone (b): 100 M env-steps in ONE train() call at the
bench-tuned config — the sustained-rate demonstration.

Take 2: the first run (and the legged r5_longrun_flagship + the
learncheck scripts) constructed the env WITHOUT knn_algorithm, falling
back to the constructor default "passes" — the slowest oracle-exact XLA
obs path (the traced rollout showed its 18 GB/s ladder reduces; no
pallas op in sight).  Semantically identical observations, so the
learning results stand; the sustained-rate claim needs the actual bench
kernel, passed explicitly here."""
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

OUT = "/root/repo/artifacts/round5/r5_longrun2.jsonl"


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


E, T, ITERS = 2000, 100, 500  # 100M env-steps
env = TpuTagContinuous(**dict(FLAGSHIP_ENV_KWARGS, seed=274880,
                             knn_algorithm="pallas_flat_exact",
                             knn_block_envs=4))
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
cfg = {
    "name": "r5long2", "env": {},
    "trainer": {"num_envs": E, "num_episodes": ITERS * E * T // 500,
                "train_batch_size": T * E, "seed": 1,
                "batch_dtype": "bfloat16"},
    "policy": {"runner": dict(fpol, lr=0.005), "tagger": dict(fpol)},
    "saving": {"metrics_log_freq": 10**9, "model_params_save_freq": 10**9,
               "basedir": "/tmp", "name": "r5long2", "tag": "t"},
}
tr = TrainerA2C(env_wrapper=engine, config=cfg,
                policy_tag_to_agent_id_map=pmap, verbose=False)
p0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                            tr._carry["params"])

# per-window rates via PerfStats (compile lands in window 1; steady
# state is windows 2+).  Round-5 fix baked in: train() now syncs the
# dispatch queue every trainer.dispatch_sync_freq iterations — the
# unbounded async queue on the tunneled deployment degraded ~3.6x.
from warpdrive_tpu.training import trainer_base

_orig_add = trainer_base.PerfStats.add_window
_windows = []

def _logged(self, iters, steps, elapsed):
    _windows.append(round(steps / max(elapsed, 1e-9)))
    return _orig_add(self, iters, steps, elapsed)

trainer_base.PerfStats.add_window = _logged
tr.metrics_log_freq = 50

t0 = time.time()
tr.train()
wall = time.time() - t0
trainer_base.PerfStats.add_window = _orig_add
log({"stage": "trained", "env_steps": ITERS * E * T,
     "wall_s": round(wall, 1),
     "window_steps_per_sec": _windows,
     "steady_state_steps_per_sec": (max(_windows[1:]) if len(_windows) > 1
                                    else _windows[0]),
     "sustained_steps_per_sec_incl_compile": round(ITERS * E * T / wall)})

pT = tr._carry["params"]


def ev(params):
    saved = tr._carry["params"]
    tr._carry = dict(tr._carry)
    tr._carry["params"] = params
    r, _ = tr.evaluate_episodes(use_argmax=True)
    tr._carry["params"] = saved
    return (round(float(r["tagger"].mean()), 3),
            round(float(r["runner"].mean()), 3))


base = ev(p0)
tvf = ev({"tagger": pT["tagger"], "runner": p0["runner"]})
rvf = ev({"tagger": p0["tagger"], "runner": pT["runner"]})
log({"stage": "cross_eval_100M", "baseline": base,
     "trained_tagger_vs_initial_runner": tvf,
     "initial_tagger_vs_trained_runner": rvf,
     "tagger_gain": round(tvf[0] - base[0], 3),
     "runner_gain": round(rvf[1] - base[1], 3)})
tr.graceful_close()
print("LONGRUN2_DONE", flush=True)
