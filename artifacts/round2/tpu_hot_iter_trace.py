"""Trace ONE tuned-flagship hot iteration and attribute device time.

profile_phases reports rollout 349 ms / update 914 ms (hot program) at
E=2000, T=100, bf16, 20 contiguous minibatches — but the standalone
runner 20-minibatch grad scan measured only 380 ms (anatomy7). This
script jits the REAL hot iteration, traces it with jax.profiler, and
aggregates device-side ops (the rollout scan and the per-policy
minibatch scans appear as distinct XLA while ops) to find where the
~900 ms actually goes. Also dumps the compiled HLO so fusion names can
be mapped to computations.

Emits JSON lines; writes trace under artifacts/round2/hot_iter_trace/.
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/artifacts/round2/hot_iter_trace"


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit(stage="start", platform=jax.devices()[0].platform)

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
    from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    T, n_envs = 100, 2000
    env = TpuTagContinuous(
        **dict(FLAGSHIP_ENV_KWARGS, seed=274880, knn_algorithm="packed",
               knn_select="bf16pair"))
    engine = EnvEngine(env_obj=env, num_envs=n_envs, seed=31)
    pmap = {
        "tagger": [i for i in range(env.num_agents)
                   if env.agent_type[i] == 1],
        "runner": [i for i in range(env.num_agents)
                   if env.agent_type[i] == 0],
    }
    pol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
           "entropy_coeff": 0.05, "clip_grad_norm": True,
           "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
           "remat": False, "num_minibatches": 20,
           "shuffle_minibatches": False,
           "model": {"type": "fully_connected", "fc_dims": [256, 256],
                     "dtype": "bfloat16"}}
    cfg = {
        "name": "hot_trace",
        "env": {},
        "trainer": {"num_envs": n_envs, "num_episodes": 4 * n_envs,
                    "train_batch_size": T * n_envs, "seed": 1,
                    "batch_dtype": "bfloat16"},
        "policy": {"runner": dict(pol, lr=0.005), "tagger": dict(pol)},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "hot_trace", "tag": "t"},
    }
    tr = TrainerA2C(env_wrapper=engine, config=cfg,
                    policy_tag_to_agent_id_map=pmap, verbose=False)

    hot = jax.jit(tr._build_hot_iteration_fn())
    carry = jax.tree_util.tree_map(jnp.copy, tr._carry)
    t_arg = jnp.asarray(0.0, jnp.float32)

    # dump compiled HLO for fusion-name mapping
    lowered = hot.lower(carry, t_arg)
    compiled = lowered.compile()
    with open(os.path.join("/root/repo/artifacts/round2",
                           "hot_iter_hlo.txt"), "w") as f:
        f.write(compiled.as_text())
    emit(stage="hlo_dumped")

    out = hot(carry, t_arg)  # warm (already compiled)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = hot(out[0], t_arg)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    emit(stage="warm_iter_ms", ms=round((time.perf_counter() - t0) * 1e3, 1))

    os.makedirs(OUT, exist_ok=True)
    with jax.profiler.trace(OUT):
        out = hot(out[0], t_arg)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    emit(stage="trace_done")

    # ---- parse: newest trace.json.gz under OUT
    paths = sorted(glob.glob(os.path.join(
        OUT, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        emit(stage="no_trace_file")
        return
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    durs = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in tpu_pids:
            durs[e.get("name", "?")] += e["dur"]
    total = sum(v for k, v in durs.items() if k.startswith("jit_"))
    emit(stage="jit_total_ms", ms=round(total / 1e3, 1))
    for name, d in durs.most_common(40):
        emit(op=name[:80], ms=round(d / 1e3, 2))
    emit(stage="done")


if __name__ == "__main__":
    main()
