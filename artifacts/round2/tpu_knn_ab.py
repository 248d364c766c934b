"""A/B the kNN observation kernels on the real chip.

Stages (one JSON line each):
  * obs-only: variant x block_envs sweep at 2000 envs (outputs cross-checked)
  * env-only simulation loop (physics+obs+reset scan) per knn_algorithm
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from warpdrive_tpu.presets import build_flagship  # noqa: E402

print("devices:", jax.devices(), flush=True)

NE = 2000


def emit(**kw):
    print(json.dumps(kw), flush=True)


def time_it(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def time_scan(step_fn, carry, n_steps, num_envs, repeats=3):
    def scan_fn(c, k):
        keys = jax.random.split(k, n_steps)
        return jax.lax.scan(lambda s, kk: (step_fn(s, kk), 0), c, keys)[0]

    jitted = jax.jit(scan_fn)
    key = jax.random.PRNGKey(7)
    key, sub = jax.random.split(key)
    carry = jitted(carry, sub)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    best = 0.0
    for _ in range(repeats):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        out = jitted(carry, sub)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = max(best, n_steps * num_envs / (time.perf_counter() - t0))
    return best


def obs_sweep():
    from warpdrive_tpu.ops.knn_obs import knn_observation

    s = build_flagship(num_envs=NE, seed=0)
    env, st = s["env"], s["state"]
    eps = 1e-10
    feats = jnp.stack(
        [
            st["loc_x"] / env.grid_diagonal,
            st["loc_y"] / env.grid_diagonal,
            st["speed"] / (env.max_speed + eps),
            st["acceleration"] / (env.max_speed + eps),
            st["direction"] / np.float32(2 * np.pi),
        ],
        axis=1,
    )
    args = (
        st["loc_x"],
        st["loc_y"],
        feats,
        jnp.asarray(env.agent_types, dtype=jnp.float32),
        st["still_in_the_game"].astype(jnp.float32),
        jnp.zeros((NE,), jnp.float32),
    )
    ref = None
    for variant in ("packed", "onehot"):
        for be in (2, 4, 8, 16, 32):
            try:
                fn = jax.jit(
                    lambda *a, v=variant, b=be: knn_observation(
                        *a,
                        n_agents=env.num_agents,
                        k=env.num_other_agents_observed,
                        block_envs=b,
                        variant=v,
                    )
                )
                dt, out = time_it(fn, *args)
                if ref is None:
                    ref = np.asarray(out)
                else:
                    np.testing.assert_allclose(
                        np.asarray(out), ref, rtol=1e-5, atol=1e-6
                    )
                emit(
                    stage="obs_only",
                    variant=variant,
                    block_envs=be,
                    ms=round(dt * 1000, 3),
                )
            except Exception as e:  # noqa: BLE001
                emit(
                    stage="obs_only",
                    variant=variant,
                    block_envs=be,
                    error=f"{type(e).__name__}: {str(e)[:200]}",
                )


def env_loop(algo):
    try:
        s = build_flagship(num_envs=NE, seed=0, knn_algorithm=algo)
        rate = time_scan(
            s["env_only_step"], (s["state"], jnp.zeros(())), 500, NE
        )
        emit(stage="env_only_loop", algo=algo, env_steps_per_s=round(rate))
    except Exception as e:  # noqa: BLE001
        emit(
            stage="env_only_loop",
            algo=algo,
            error=f"{type(e).__name__}: {str(e)[:300]}",
        )


def full_loop(algo):
    try:
        s = build_flagship(num_envs=NE, seed=0, knn_algorithm=algo)
        params = s["params"]

        def full(state, key):
            return s["full_loop_step"](params, state, key)

        rate = time_scan(full, s["state"], 500, NE)
        emit(stage="full_loop", algo=algo, env_steps_per_s=round(rate))
    except Exception as e:  # noqa: BLE001
        emit(
            stage="full_loop",
            algo=algo,
            error=f"{type(e).__name__}: {str(e)[:300]}",
        )


if __name__ == "__main__":
    emit(stage="start", platform=jax.devices()[0].platform)
    obs_sweep()
    for algo in ("pallas", "passes"):
        env_loop(algo)
    full_loop("pallas")
    emit(stage="done")
