"""Env-count sweep for the packed kNN flagship (env-only + full loop)."""
import json, sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from artifacts.round2.tpu_knn_ladder_ab import time_scan  # noqa: E402

def emit(**kw):
    print(json.dumps(kw), flush=True)

emit(stage="start", platform=jax.devices()[0].platform)
from warpdrive_tpu.presets import build_flagship
for ne in (1000, 2000, 4000, 8000):
    try:
        s = build_flagship(num_envs=ne, seed=0)
        rate, compile_s = time_scan(
            s["env_only_step"], (s["state"], jnp.zeros(())), 500, ne)
        emit(stage="env_only", num_envs=ne, env_steps_per_s=round(rate),
             compile_s=round(compile_s, 1))
    except Exception as e:
        emit(stage="env_only", num_envs=ne, error=f"{type(e).__name__}: {e}"[:200])
for ne in (2000, 4000):
    try:
        s = build_flagship(num_envs=ne, seed=0)
        def full_step(carry, key, _s=s):
            state, _ = carry
            return (_s["full_loop_step"](_s["params"], state, key), 0.0)
        rate, compile_s = time_scan(full_step, (s["state"], 0.0), 500, ne)
        emit(stage="full_loop", num_envs=ne, env_steps_per_s=round(rate),
             compile_s=round(compile_s, 1))
    except Exception as e:
        emit(stage="full_loop", num_envs=ne, error=f"{type(e).__name__}: {e}"[:200])
emit(stage="done")
