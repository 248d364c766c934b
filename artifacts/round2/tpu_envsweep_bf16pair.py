"""Post-bf16pair num_envs sweep for the flagship env-only headline.

The round-1 sweep (tpu_envsweep_packed.log) predates the bf16pair MXU
selection default; the MXU matmul's efficiency depends on batch, so the
optimal replica count may have moved. Env-only rollout, best of 3x500-step
scans, carry chained between repeats (tunnel memoization rule).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

print(json.dumps({"stage": "start"}), flush=True)
platform = jax.devices()[0].platform
print(json.dumps({"stage": "devices", "platform": platform}), flush=True)

sys.path.insert(0, "/root/repo")
from warpdrive_tpu.presets import build_flagship  # noqa: E402


def rate(step_fn, state, n_steps, num_envs, key, repeats=3):
    def scan_fn(st, k):
        keys = jax.random.split(k, n_steps)
        return jax.lax.scan(lambda s, kk: (step_fn(s, kk), 0), st, keys)[0]

    jitted = jax.jit(scan_fn)
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    state = jitted(state, sub)
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    compile_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(repeats):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state = jitted(state, sub)
        jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
        best = max(best, n_steps * num_envs / (time.perf_counter() - t0))
    return best, compile_s


key = jax.random.PRNGKey(0)
for ne in (1000, 1500, 2000, 3000, 4000):
    s = build_flagship(num_envs=ne, fc_dims=(256, 256), seed=0)
    r, c = rate(s["env_only_step"], (s["state"], jnp.zeros(())), 500, ne, key)
    print(
        json.dumps(
            {
                "stage": "env_only",
                "num_envs": ne,
                "env_steps_per_s": round(r),
                "compile_s": round(c, 1),
            }
        ),
        flush=True,
    )
print(json.dumps({"stage": "done"}), flush=True)
