"""Round-5 A/B #3: op-level trace of the flagship FULL LOOP scan
(VERDICT r4 next #4 — the 747K full loop vs 1.062M env-only gap =
~0.4 ms/fleet-step of policy+sample+bookkeeping never decomposed).

Traces a 50-step full-loop lax.scan @E=2000 (policy fwd + categorical
sampling + env step + auto-reset) and converts the xplane to
framework_op_stats / op_profile JSON.
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
from warpdrive_tpu.presets import build_flagship  # noqa: E402

E, T = 2000, 50
LOGDIR = "/root/repo/artifacts/round5/trace_fullloop"

sys_ = build_flagship(num_envs=E, fc_dims=(256, 256), seed=0)
step = sys_["full_loop_step"]
params = sys_["params"]


def scan_fn(p, st, k):
    keys = jax.random.split(k, T)
    return jax.lax.scan(lambda s, kk: (step(p, s, kk), 0), st, keys)[0]


jitted = jax.jit(scan_fn)
key = jax.random.PRNGKey(7)
state = sys_["state"]
key, sub = jax.random.split(key)
state = jitted(params, state, sub)
np.asarray(jax.tree_util.tree_leaves(state)[0]).ravel()[:1]
print("compiled; timing...", flush=True)

# direct rate check (value-fetched, fresh keys)
t0 = time.perf_counter()
for _ in range(3):
    key, sub = jax.random.split(key)
    state = jitted(params, state, sub)
    np.asarray(jax.tree_util.tree_leaves(state)[0]).ravel()[:1]
dt = (time.perf_counter() - t0) / 3
print(f"full-loop rate: {T * E / dt:,.0f} env-steps/s "
      f"({dt / T * 1e3:.3f} ms/fleet-step)", flush=True)

with jax.profiler.trace(LOGDIR):
    for _ in range(2):
        key, sub = jax.random.split(key)
        state = jitted(params, state, sub)
    np.asarray(jax.tree_util.tree_leaves(state)[0]).ravel()[:1]
print("trace captured", flush=True)

xplanes = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                    recursive=True)
print("xplane files:", xplanes, flush=True)
ok = False
for tool in ("framework_op_stats", "op_profile"):
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
print("AB3_DONE" if ok else "AB3_TRACE_ONLY", flush=True)
