"""Verify the new flagship default knn_select="bf16pair" on the chip.

1. build_flagship() with defaults -> env.knn_select must be "bf16pair".
2. Obs equality: default build vs knn_select="fused" build on the same
   rolled state (max abs diff must be < 2e-5).
3. Short env-only rollout timing through the public preset fast path.
One JSON line per stage.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit(stage="start", platform=jax.devices()[0].platform)
    from warpdrive_tpu.presets import build_flagship

    ne, steps = 2000, 500
    s = build_flagship(num_envs=ne, seed=0)
    emit(stage="default_check", knn_select=s["engine"].env.knn_select,
         ok=s["engine"].env.knn_select == "bf16pair")

    s_f = build_flagship(num_envs=ne, seed=0, knn_select="fused")

    # roll the default system a few steps eagerly-jitted, then compare obs
    key = jax.random.PRNGKey(9)
    state = s["state"]
    roll = jax.jit(s["env_only_step"])
    carry = (state, jnp.zeros(()))
    for _ in range(5):
        key, sub = jax.random.split(key)
        carry = roll(carry, sub)
    rolled = carry[0]
    ob_a = np.asarray(s["engine"].observe(dict(rolled)))
    ob_b = np.asarray(s_f["engine"].observe(dict(rolled)))
    err = float(np.max(np.abs(ob_a - ob_b)))
    emit(stage="obs_equality", max_abs=err, ok=bool(err < 2e-5))

    @jax.jit
    def run(carry, key):
        from jax import lax
        return lax.scan(lambda c, kk: (s["env_only_step"](c, kk), 0),
                        carry, jax.random.split(key, steps))[0]

    carry = (s["state"], jnp.zeros(()))
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    carry = run(carry, sub)
    jax.block_until_ready(carry[1])
    compile_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(3):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        carry = run(carry, sub)
        jax.block_until_ready(carry[1])
        best = max(best, steps * ne / (time.perf_counter() - t0))
    emit(stage="env_only_default", env_steps_per_s=round(best),
         compile_s=round(compile_s, 1))
    emit(stage="done")


if __name__ == "__main__":
    main()
