"""Flagship tuned mb80/mb100 probe (post fused-head; mb40 = 316K)."""
import json, time, sys
sys.path.insert(0, "/root/repo")
import jax
print("devices:", jax.devices(), flush=True)
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS
from warpdrive_tpu.training.trainer_a2c import TrainerA2C

OUT = "/root/repo/artifacts/round4/r4_ab6_results.jsonl"
E, T = 2000, 100

def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")

fenv = TpuTagContinuous(**dict(FLAGSHIP_ENV_KWARGS, seed=274880,
                               knn_algorithm="pallas_mxu_exact"))
fengine = EnvEngine(env_obj=fenv, num_envs=E, seed=31)
pmap = {
    "tagger": [i for i in range(fenv.num_agents) if fenv.agent_type[i] == 1],
    "runner": [i for i in range(fenv.num_agents) if fenv.agent_type[i] == 0],
}
for mb in (400,):
    fpol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
            "entropy_coeff": 0.05, "clip_grad_norm": True,
            "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
            "num_minibatches": mb, "shuffle_minibatches": False,
            "model": {"type": "fully_connected", "fc_dims": [256, 256],
                      "dtype": "bfloat16"}}
    cfg = {
        "name": "r4ab6b", "env": {},
        "trainer": {"num_envs": E, "num_episodes": 4 * E,
                    "train_batch_size": T * E, "seed": 1,
                    "batch_dtype": "bfloat16"},
        "policy": {"runner": dict(fpol, lr=0.005), "tagger": dict(fpol)},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "r4ab6b", "tag": "t"},
    }
    try:
        t0 = time.time()
        tr = TrainerA2C(env_wrapper=fengine, config=cfg,
                        policy_tag_to_agent_id_map=pmap, verbose=False)
        prof = tr.profile_phases(repeats=3)
        log({"variant": f"envmajor_mb{mb}_fused",
             "steps_per_sec": round(prof["steps_per_sec"]),
             "rollout_ms": round(prof["rollout_ms"], 2),
             "update_ms": round(prof["update_ms"], 2),
             "iteration_ms": round(prof["iteration_ms"], 2),
             "wall_s": round(time.time() - t0, 1)})
        tr.graceful_close()
    except Exception as e:
        log({"variant": f"envmajor_mb{mb}_fused",
             "error": f"{type(e).__name__}: {e}"[:300]})
print("AB6B_DONE", flush=True)
