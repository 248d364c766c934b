"""Round-4 A/B #2b: tuned-flagship UPDATE decomposition, one variant per
SUBPROCESS (the monolithic r4_ab2 OOM'd: it held an f32 batch (7.4 GB) +
a bf16 batch (3.7 GB) + live trainers on a 16 GB chip, and CLAUDE.md
rule 6 says a failed compile can wedge the next one in-process anyway).

Usage:
  python r4_ab2b_update.py driver            # runs all variants
  python r4_ab2b_update.py one LABEL MB MDT BDT REMAT   # one variant

Each worker: builds the tuned-flagship trainer (E=2000, T=100, fc
256x256, two policies), runs ONE rollout to materialize a real batch,
then times the UPDATE-ONLY jitted program directly (params chained
between repeats so the tunnel cannot memoize).
"""
import json
import os
import subprocess
import sys
import time

OUT = "/root/repo/artifacts/round4/r4_ab2b_results.jsonl"
E, T = 2000, 100

VARIANTS = [
    # (label, mb, model_dtype, batch_dtype, remat)
    ("mb20_bf16_bf16 (bench r3 tuned)", 20, "bfloat16", "bfloat16", 0),
    ("mb10_bf16_bf16", 10, "bfloat16", "bfloat16", 0),
    ("mb4_bf16_bf16", 4, "bfloat16", "bfloat16", 0),
    ("mb2_bf16_bf16", 2, "bfloat16", "bfloat16", 0),
    ("mb1_bf16_bf16", 1, "bfloat16", "bfloat16", 0),
    ("mb40_bf16_bf16", 40, "bfloat16", "bfloat16", 0),
    ("mb20_bf16_bf16_remat", 20, "bfloat16", "bfloat16", 1),
    ("mb1_bf16_bf16_remat", 1, "bfloat16", "bfloat16", 1),
    ("mb20_f32model_bf16batch", 20, "float32", "bfloat16", 0),
    ("mb20_bf16model_f32batch", 20, "bfloat16", "float32", 0),
]


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def run_one(label, mb, mdt, bdt, remat):
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)
    sys.path.insert(0, "/root/repo")
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
    from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    fenv = TpuTagContinuous(**dict(FLAGSHIP_ENV_KWARGS, seed=274880,
                                   knn_algorithm="pallas_mxu_exact"))
    fengine = EnvEngine(env_obj=fenv, num_envs=E, seed=31)
    pmap = {
        "tagger": [i for i in range(fenv.num_agents)
                   if fenv.agent_type[i] == 1],
        "runner": [i for i in range(fenv.num_agents)
                   if fenv.agent_type[i] == 0],
    }
    fpol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
            "entropy_coeff": 0.05, "clip_grad_norm": True,
            "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
            "num_minibatches": mb, "shuffle_minibatches": False,
            "remat": bool(remat),
            "model": {"type": "fully_connected", "fc_dims": [256, 256],
                      **({"dtype": mdt} if mdt != "float32" else {})}}
    cfg = {
        "name": "r4ab2b", "env": {},
        "trainer": {"num_envs": E, "num_episodes": 4 * E,
                    "train_batch_size": T * E, "seed": 1,
                    "batch_dtype": bdt},
        "policy": {"runner": dict(fpol, lr=0.005), "tagger": dict(fpol)},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "r4ab2b", "tag": "t"},
    }
    tr = TrainerA2C(env_wrapper=fengine, config=cfg,
                    policy_tag_to_agent_id_map=pmap, verbose=False)

    rfn = jax.jit(tr._build_rollout_profile_fn())
    t0 = time.time()
    outs = rfn(tr._carry, jax.random.PRNGKey(1))
    jax.block_until_ready(jax.tree_util.tree_leaves(outs)[0])
    rollout_compile_s = round(time.time() - t0, 1)
    batch = outs[1]

    import numpy as np

    def fetch(tree):
        # VALUE FETCH, not block_until_ready: the tunnel can defer
        # realization past "ready" (ROUND4_NOTES.md tooling discovery) —
        # mb10 measured a bogus 0.5 ms with block_until_ready only.
        leaf = jax.tree_util.tree_leaves(tree)[0]
        np.asarray(leaf).ravel()[:1]

    upd = jax.jit(tr._build_update_profile_fn())
    t_arg = jnp.asarray(0.0, jnp.float32)
    key = jax.random.PRNGKey(5)
    t0 = time.time()
    out = upd(tr._carry, batch, t_arg, key)
    fetch(out)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        key, sub = jax.random.split(key)
        t0 = time.time()
        out = upd(out, batch, t_arg, sub)
        fetch(out)
        best = min(best, time.time() - t0)
    log({"variant": label, "update_ms": round(best * 1000, 1),
         "update_compile_s": round(compile_s, 1),
         "rollout_compile_s": rollout_compile_s,
         "steps_per_update": T * E,
         "update_env_steps_per_sec": round(T * E / best)})


def driver():
    for label, mb, mdt, bdt, remat in VARIANTS:
        cmd = [sys.executable, "-u", os.path.abspath(__file__), "one",
               label, str(mb), mdt, bdt, str(remat)]
        print(f"=== {label}", flush=True)
        try:
            r = subprocess.run(cmd, timeout=900)
            if r.returncode != 0:
                log({"variant": label,
                     "error": f"worker exited {r.returncode}"})
        except subprocess.TimeoutExpired:
            log({"variant": label, "error": "worker timeout 900s"})
            # a killed client can wedge the chip claim; stop the sweep
            print("ABORTING sweep after timeout (chip claim risk)",
                  flush=True)
            break
    print("AB2B_DONE", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "driver":
        driver()
    else:
        _, _, label, mb, mdt, bdt, remat = sys.argv
        run_one(label, int(mb), mdt, bdt, int(remat))
