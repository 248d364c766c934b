"""Round-4 A/B #2: the tuned-flagship UPDATE program, attacked with the
same decomposition rigor the rollout got (VERDICT r3 next #2).

Tuned config: TagContinuous E=2000, T=100, two policies, fc 256x256.
The rollout runs ONCE per batch dtype to materialize a real batch; each
update variant is then timed DIRECTLY (the round-4 update-only program,
chained params, fresh keys).  Variants ordered so the OOM-riskiest
compiles run LAST (CLAUDE.md rule 6: a failed remote compile can wedge
the next compile in the same process).
"""
import json, time, sys
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

sys.path.insert(0, "/root/repo")
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS
from warpdrive_tpu.training.trainer_a2c import TrainerA2C

OUT = "/root/repo/artifacts/round4/r4_ab2_results.jsonl"
E, T = 2000, 100

fenv = TpuTagContinuous(**dict(FLAGSHIP_ENV_KWARGS, seed=274880,
                               knn_algorithm="pallas_mxu_exact"))
fengine = EnvEngine(env_obj=fenv, num_envs=E, seed=31)
pmap = {
    "tagger": [i for i in range(fenv.num_agents) if fenv.agent_type[i] == 1],
    "runner": [i for i in range(fenv.num_agents) if fenv.agent_type[i] == 0],
}

def make_trainer(mb, model_dtype, batch_dtype, remat=False):
    fpol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
            "entropy_coeff": 0.05, "clip_grad_norm": True,
            "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
            "num_minibatches": mb, "shuffle_minibatches": False,
            "remat": remat,
            "model": {"type": "fully_connected", "fc_dims": [256, 256],
                      **({"dtype": model_dtype}
                         if model_dtype != "float32" else {})}}
    cfg = {
        "name": "r4ab2", "env": {},
        "trainer": {"num_envs": E, "num_episodes": 4 * E,
                    "train_batch_size": T * E, "seed": 1,
                    "batch_dtype": batch_dtype},
        "policy": {"runner": dict(fpol, lr=0.005), "tagger": dict(fpol)},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "r4ab2", "tag": "t"},
    }
    return TrainerA2C(env_wrapper=fengine, config=cfg,
                      policy_tag_to_agent_id_map=pmap, verbose=False)

def timeit_update(tr, batch, repeats=3):
    upd = jax.jit(tr._build_update_profile_fn())
    t_arg = jnp.asarray(0.0, jnp.float32)
    key = jax.random.PRNGKey(5)
    carry = tr._carry
    t0 = time.time()
    out = upd(carry, batch, t_arg, key)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(repeats):
        key, sub = jax.random.split(key)
        t0 = time.time()
        out = upd(out, batch, t_arg, sub)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time() - t0)
    return best * 1000, compile_s

def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")

# one rollout per batch dtype materializes the real batch
batches = {}
for bdt in ("bfloat16", "float32"):
    src = make_trainer(mb=20, model_dtype="bfloat16", batch_dtype=bdt)
    rfn = jax.jit(src._build_rollout_profile_fn())
    t0 = time.time()
    outs = rfn(src._carry, jax.random.PRNGKey(1))
    jax.block_until_ready(jax.tree_util.tree_leaves(outs)[0])
    log({"stage": f"rollout_{bdt}", "compile_plus_run_s":
         round(time.time() - t0, 1)})
    batches[bdt] = outs[1]

VARIANTS = [
    # (label, mb, model_dtype, batch_dtype, remat)
    ("mb20_bf16_bf16 (bench r3 tuned)", 20, "bfloat16", "bfloat16", False),
    ("mb10_bf16_bf16", 10, "bfloat16", "bfloat16", False),
    ("mb4_bf16_bf16", 4, "bfloat16", "bfloat16", False),
    ("mb40_bf16_bf16", 40, "bfloat16", "bfloat16", False),
    ("mb20_bf16_bf16_remat", 20, "bfloat16", "bfloat16", True),
    ("mb4_bf16_bf16_remat", 4, "bfloat16", "bfloat16", True),
    ("mb1_bf16_bf16_remat", 1, "bfloat16", "bfloat16", True),
    ("mb20_f32model_bf16batch", 20, "float32", "bfloat16", False),
    # riskiest (largest live set) LAST:
    ("mb20_bf16model_f32batch", 20, "bfloat16", "float32", False),
    ("mb2_bf16_bf16", 2, "bfloat16", "bfloat16", False),
]

for label, mb, mdt, bdt, remat in VARIANTS:
    try:
        tr = make_trainer(mb=mb, model_dtype=mdt, batch_dtype=bdt,
                          remat=remat)
        ms, comp = timeit_update(tr, batches[bdt])
        log({"variant": label, "update_ms": round(ms, 1),
             "compile_s": round(comp, 1),
             "steps_per_update": T * E})
    except Exception as e:
        log({"variant": label, "error": f"{type(e).__name__}: {e}"[:300]})
print("AB2_DONE", flush=True)
