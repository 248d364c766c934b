"""Round-4 A/B #5c: op-level trace of the gridworld 32K training
iteration (rollout-dominated: 166 ms rollout vs 128 ms update) — find
the rollout's dominant ops."""
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
from warpdrive_tpu.envs.tag_gridworld import TpuTagGridWorld
from warpdrive_tpu.training.trainer_a2c import TrainerA2C

LOGDIR = "/root/repo/artifacts/round4/trace_gridworld_iter"
t_envs, T_train, mb = 32000, 100, 8

env = TpuTagGridWorld(num_taggers=4, grid_length=20, episode_length=100,
                      seed=7, use_full_observation=False)
engine = EnvEngine(env_obj=env, num_envs=t_envs, seed=7)
cfg = {
    "name": "r4ab5c", "env": {},
    "trainer": {"num_envs": t_envs,
                "num_episodes": 4 * T_train * t_envs // 100,
                "train_batch_size": T_train * t_envs, "seed": 1,
                "batch_dtype": "bfloat16"},
    "policy": {"shared": {"to_train": True, "gamma": 0.98, "lr": 0.001,
                          "num_minibatches": mb,
                          "shuffle_minibatches": False,
                          "model": {"type": "fully_connected",
                                    "fc_dims": [64, 64],
                                    "dtype": "bfloat16"}}},
    "saving": {"metrics_log_freq": 10**9,
               "model_params_save_freq": 10**9,
               "basedir": "/tmp", "name": "r4ab5c", "tag": "t"},
}
tr = TrainerA2C(env_wrapper=engine, config=cfg, verbose=False)

undonated = jax.jit(tr._build_hot_iteration_fn())
carry = jax.tree_util.tree_map(jnp.copy, tr._carry)
t0j = jnp.asarray(0.0, jnp.float32)
out, _ = undonated(carry, t0j)
np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
print("compiled; tracing...", flush=True)
carry = out
with jax.profiler.trace(LOGDIR):
    for _ in range(3):
        carry, _ = undonated(carry, t0j)
    np.asarray(jax.tree_util.tree_leaves(carry)[0]).ravel()[:1]
print("trace captured", flush=True)

xplanes = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                    recursive=True)
for tool in ("framework_op_stats",):
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
        print(f"wrote {fn}", flush=True)
    except Exception as e:
        print(f"convert {tool} failed: {type(e).__name__}: {e}",
              flush=True)
print("AB5C_DONE", flush=True)
