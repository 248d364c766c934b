"""Round-4 A/B #2c: op-level trace of the tuned-flagship UPDATE program
(VERDICT r4 next #2 — "profile_trace the tuned-flagship update,
identify the dominant ops").

Captures a jax.profiler trace of 3 direct update executions (chained
params, value-fetched) and converts the xplane to op-profile /
framework_op_stats JSON via xprof.
"""
import glob
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS
from warpdrive_tpu.training.trainer_a2c import TrainerA2C

E, T = 2000, 100
LOGDIR = "/root/repo/artifacts/round4/trace_update_mb400"

fenv = TpuTagContinuous(**dict(FLAGSHIP_ENV_KWARGS, seed=274880,
                               knn_algorithm="pallas_mxu_exact"))
fengine = EnvEngine(env_obj=fenv, num_envs=E, seed=31)
pmap = {
    "tagger": [i for i in range(fenv.num_agents) if fenv.agent_type[i] == 1],
    "runner": [i for i in range(fenv.num_agents) if fenv.agent_type[i] == 0],
}
fpol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
        "entropy_coeff": 0.05, "clip_grad_norm": True,
        "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
        "num_minibatches": 400, "shuffle_minibatches": False,
        "model": {"type": "fully_connected", "fc_dims": [256, 256],
                  "dtype": "bfloat16"}}
cfg = {
    "name": "r4ab2c", "env": {},
    "trainer": {"num_envs": E, "num_episodes": 4 * E,
                "train_batch_size": T * E, "seed": 1,
                "batch_dtype": "bfloat16"},
    "policy": {"runner": dict(fpol, lr=0.005), "tagger": dict(fpol)},
    "saving": {"metrics_log_freq": 10**9,
               "model_params_save_freq": 10**9,
               "basedir": "/tmp", "name": "r4ab2c", "tag": "t"},
}
tr = TrainerA2C(env_wrapper=fengine, config=cfg,
                policy_tag_to_agent_id_map=pmap, verbose=False)

rfn = jax.jit(tr._build_rollout_profile_fn())
outs = rfn(tr._carry, jax.random.PRNGKey(1))
batch = outs[1]
upd = jax.jit(tr._build_update_profile_fn())
t_arg = jnp.asarray(0.0, jnp.float32)
key = jax.random.PRNGKey(5)
out = upd(tr._carry, batch, t_arg, key)
np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
print("compiled; tracing...", flush=True)

with jax.profiler.trace(LOGDIR):
    for _ in range(3):
        key, sub = jax.random.split(key)
        out = upd(out, batch, t_arg, sub)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
print("trace captured", flush=True)

# ---- convert xplane -> op stats json --------------------------------
xplanes = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                    recursive=True)
print("xplane files:", xplanes, flush=True)
ok = False
for tool in ("framework_op_stats", "op_profile", "overview_page"):
    try:
        try:
            from xprof.convert import raw_to_tool_data as rtt
        except ImportError:
            from tensorboard_plugin_profile.convert import (
                raw_to_tool_data as rtt,
            )
        data, _ = rtt.xspace_to_tool_data(xplanes, tool, {})
        if isinstance(data, bytes):
            data = data.decode("utf-8", errors="replace")
        fn = os.path.join(LOGDIR, f"{tool}.json")
        with open(fn, "w") as f:
            f.write(data if isinstance(data, str) else json.dumps(data))
        print(f"wrote {fn} ({len(data)} bytes)", flush=True)
        ok = True
    except Exception as e:
        print(f"convert {tool} failed: {type(e).__name__}: {e}",
              flush=True)
print("AB2C_DONE" if ok else "AB2C_TRACE_ONLY", flush=True)
