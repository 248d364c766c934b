"""Grid A/B on TPU: kNN algorithm x selection mode, env-only rollout rate.

Flagship shape: 2000 envs x 105 agents, k=10, 500 steps per scan.
One JSON line per measurement.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def time_scan(step_fn, carry, n_steps, num_envs, repeats=3, key=None):
    key = jax.random.PRNGKey(7) if key is None else key

    def scan_fn(c, k):
        keys = jax.random.split(k, n_steps)
        return jax.lax.scan(lambda s, kk: (step_fn(s, kk), 0), c, keys)[0]

    jitted = jax.jit(scan_fn)
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    carry = jitted(carry, sub)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    compile_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(repeats):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        carry = jitted(carry, sub)
        jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
        best = max(best, n_steps * num_envs / (time.perf_counter() - t0))
    return best, compile_s


def main():
    devs = jax.devices()
    emit(stage="start", platform=devs[0].platform, n_devices=len(devs))
    from warpdrive_tpu.presets import build_flagship

    ne = 2000
    grid = [
        ("ladder", "gather"),
        ("topk", "gather"),
        ("topk", "fused"),
        ("ladder", "fused"),
        ("packed", "gather"),
    ]
    for algo, sel in grid:
        try:
            s = build_flagship(
                num_envs=ne, seed=0, knn_algorithm=algo, knn_select=sel
            )
            rate, compile_s = time_scan(
                s["env_only_step"], (s["state"], jnp.zeros(())), 500, ne
            )
            emit(
                stage="env_only",
                algo=algo,
                select=sel,
                num_envs=ne,
                env_steps_per_s=round(rate),
                compile_s=round(compile_s, 1),
            )
        except Exception as e:  # noqa: BLE001
            emit(stage="env_only", algo=algo, select=sel,
                 error=f"{type(e).__name__}: {e}")

    emit(stage="done")


if __name__ == "__main__":
    main()
