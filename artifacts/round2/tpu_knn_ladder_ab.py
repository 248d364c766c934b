"""A/B the kNN observation algorithms in the full env-only rollout on TPU.

Variants: passes (current default), topk, ladder (exact monotonic ladder,
no matrix rewrite), packed (quantized-index ladder, 1 pass/slot).
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
    for algo in ("ladder", "packed", "passes", "topk"):
        try:
            s = build_flagship(num_envs=ne, seed=0, knn_algorithm=algo)
            rate, compile_s = time_scan(
                s["env_only_step"], (s["state"], jnp.zeros(())), 500, ne
            )
            emit(
                stage="env_only",
                algo=algo,
                num_envs=ne,
                env_steps_per_s=round(rate),
                compile_s=round(compile_s, 1),
            )
        except Exception as e:  # noqa: BLE001
            emit(stage="env_only", algo=algo, error=f"{type(e).__name__}: {e}")

    # full loop (policy + sample + step + reset) with the best candidates
    for algo in ("ladder", "packed"):
        try:
            s = build_flagship(num_envs=ne, seed=0, knn_algorithm=algo)

            def full_step(carry, key, _s=s):
                state, _ = carry
                return (_s["full_loop_step"](_s["params"], state, key), 0.0), 0

            rate, compile_s = time_scan(
                lambda c, k: full_step(c, k)[0],
                (s["state"], 0.0),
                500,
                ne,
            )
            emit(
                stage="full_loop",
                algo=algo,
                num_envs=ne,
                env_steps_per_s=round(rate),
                compile_s=round(compile_s, 1),
            )
        except Exception as e:  # noqa: BLE001
            emit(stage="full_loop", algo=algo, error=f"{type(e).__name__}: {e}")

    emit(stage="done")


if __name__ == "__main__":
    main()
