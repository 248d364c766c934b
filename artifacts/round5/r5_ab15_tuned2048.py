"""r5_ab15: tuned-training throughput A/B — E=2048/mb512 (lane-aligned:
2048*105 = 215040 = 1680*128) vs the learning-validated E=2000/mb400
bench geometry (210000/128 = 1640.6, ragged trailing tile).

THROUGHPUT ONLY: if the aligned geometry does not clearly win, the
bench stage stays at the validated E=2000/mb400; if it wins, a fresh
learncheck at the new geometry is required before any bench change
(VERDICT r4 next #2 discipline)."""
import json
import sys

import jax

sys.path.insert(0, "/root/repo")
from bench import _prof_disp  # noqa: E402
from warpdrive_tpu.envs.engine import EnvEngine  # noqa: E402
from warpdrive_tpu.envs.tag_continuous import (  # noqa: E402
    TpuTagContinuous,
)
from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS  # noqa: E402
from warpdrive_tpu.training.trainer_a2c import TrainerA2C  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab15_results.jsonl"

FPOL = {
    "to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
    "entropy_coeff": 0.05, "clip_grad_norm": True,
    "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
}


def run(t_envs, n_mb, T=100):
    env = TpuTagContinuous(
        **dict(FLAGSHIP_ENV_KWARGS, seed=274880,
               knn_algorithm="pallas_flat_exact", knn_block_envs=4))
    engine = EnvEngine(env_obj=env, num_envs=t_envs, seed=31)
    pmap = {
        "tagger": [i for i in range(env.num_agents) if env.agent_type[i] == 1],
        "runner": [i for i in range(env.num_agents) if env.agent_type[i] == 0],
    }
    pol = dict(FPOL, num_minibatches=n_mb, shuffle_minibatches=False,
               model={"type": "fully_connected", "fc_dims": [256, 256],
                      "dtype": "bfloat16"})
    cfg = {
        "name": f"ab15_e{t_envs}_mb{n_mb}",
        "env": {},
        "trainer": {"num_envs": t_envs, "num_episodes": 4 * t_envs,
                    "train_batch_size": T * t_envs, "seed": 1,
                    "batch_dtype": "bfloat16"},
        "policy": {"runner": dict(pol, lr=0.005), "tagger": dict(pol)},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "ab15", "tag": "t"},
    }
    tr = TrainerA2C(env_wrapper=engine, config=cfg,
                    policy_tag_to_agent_id_map=pmap, verbose=False)
    prof = tr.profile_phases(repeats=3)
    disp = _prof_disp(prof)
    rec = {"stage": "tuned_training", "num_envs": t_envs, "num_mb": n_mb,
           **disp,
           "rollout_ms": round(prof.get("rollout_ms", -1), 2),
           "update_ms": round(prof.get("update_ms", -1), 2)}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    print("acquiring device...", flush=True)
    print(f"device: {jax.devices()[0].platform}", flush=True)
    run(2048, 512)
    run(2000, 400)
    print("done", flush=True)


if __name__ == "__main__":
    main()
