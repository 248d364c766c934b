"""Verify the packed/ladder kNN paths + v2 Pallas kernel on the real TPU.

Stages: (1) numerical agreement of every knn_algorithm x knn_select combo
vs the 'passes' baseline over a short real rollout; (2) throughput grid
env-only + full-loop; (3) Pallas kernel v1 vs v2 standalone.
One JSON line per measurement.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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
    return carry, best, compile_s


def main():
    devs = jax.devices()
    emit(stage="start", platform=devs[0].platform, n_devices=len(devs))
    from warpdrive_tpu.presets import build_flagship

    # 1) numerical agreement over a short real rollout (same seeds)
    ref = None
    combos = [("passes", "fused"), ("ladder", "fused"), ("ladder", "gather"),
              ("packed", "fused"), ("packed", "gather"), ("topk", "fused"),
              ("topk", "gather")]
    for algo, select in combos:
        try:
            s = build_flagship(num_envs=32, seed=0, knn_algorithm=algo,
                               knn_select=select)
            carry, _, _ = time_scan(
                s["env_only_step"], (s["state"], jnp.zeros(())), 60, 32,
                repeats=1,
            )
            lx = np.asarray(carry[0]["loc_x"])
            if ref is None:
                ref = lx
                agree = True
            else:
                agree = bool(np.allclose(lx, ref, rtol=1e-5, atol=1e-5))
            emit(stage="numcheck", algo=algo, select=select,
                 agrees_with_passes=agree)
        except Exception as e:  # noqa: BLE001
            emit(stage="numcheck", algo=algo, select=select,
                 error=f"{type(e).__name__}: {e}"[:300])

    # 2) throughput grid
    ne = 2000
    for algo, select in [("packed", "fused"), ("packed", "gather"),
                         ("ladder", "fused"), ("ladder", "gather"),
                         ("topk", "gather")]:
        try:
            s = build_flagship(num_envs=ne, seed=0, knn_algorithm=algo,
                               knn_select=select)
            _, rate, compile_s = time_scan(
                s["env_only_step"], (s["state"], jnp.zeros(())), 500, ne
            )
            emit(stage="env_only", algo=algo, select=select, num_envs=ne,
                 env_steps_per_s=round(rate), compile_s=round(compile_s, 1))
        except Exception as e:  # noqa: BLE001
            emit(stage="env_only", algo=algo, select=select,
                 error=f"{type(e).__name__}: {e}"[:300])

    for algo, select in [("packed", "fused"), ("packed", "gather")]:
        try:
            s = build_flagship(num_envs=ne, seed=0, knn_algorithm=algo,
                               knn_select=select)

            def full_step(carry, key, _s=s):
                state, _ = carry
                return (_s["full_loop_step"](_s["params"], state, key), 0.0)

            _, rate, compile_s = time_scan(
                full_step, (s["state"], 0.0), 500, ne
            )
            emit(stage="full_loop", algo=algo, select=select, num_envs=ne,
                 env_steps_per_s=round(rate), compile_s=round(compile_s, 1))
        except Exception as e:  # noqa: BLE001
            emit(stage="full_loop", algo=algo, select=select,
                 error=f"{type(e).__name__}: {e}"[:300])

    # 3) Pallas kernel v1 vs v2 standalone (out of scan)
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
    from warpdrive_tpu.ops.knn_obs import knn_observation

    env = TpuTagContinuous(num_taggers=5, num_runners=100,
                           grid_length=20.0, episode_length=500,
                           num_other_agents_observed=10,
                           use_full_observation=False)
    rng = np.random.default_rng(0)
    E, N = 2000, env.num_agents
    lx = jnp.asarray(rng.uniform(0, 20, (E, N)), jnp.float32)
    ly = jnp.asarray(rng.uniform(0, 20, (E, N)), jnp.float32)
    feats = jnp.asarray(rng.uniform(0, 1, (E, 5, N)), jnp.float32)
    types = jnp.asarray(env.agent_types, jnp.float32)
    still = jnp.ones((E, N), jnp.float32)
    tn = jnp.zeros((E,), jnp.float32)

    outs = {}
    for variant in ("onehot", "packed"):
        try:
            def f(v=variant):
                return knn_observation(lx, ly, feats, types, still, tn,
                                       n_agents=N, k=10, variant=v)
            o = f()
            jax.block_until_ready(o)
            t0 = time.perf_counter()
            for _ in range(20):
                o = f()
            jax.block_until_ready(o)
            dt = (time.perf_counter() - t0) / 20
            outs[variant] = np.asarray(o)
            emit(stage="pallas", variant=variant, obs_per_s=int(E * N / dt),
                 ms=round(dt * 1e3, 3))
        except Exception as e:  # noqa: BLE001
            emit(stage="pallas", variant=variant,
                 error=f"{type(e).__name__}: {e}"[:300])
    if len(outs) == 2:
        emit(stage="pallas_agree",
             agree=bool(np.allclose(outs["onehot"], outs["packed"],
                                    rtol=1e-5, atol=1e-5)))

    emit(stage="done")


if __name__ == "__main__":
    main()
