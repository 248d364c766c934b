"""Env-family simulation-rate sweep on the chip.

For each env family: fused env-only rollout (uniform random actions +
step + observe + done-driven auto-reset) in one jitted lax.scan.
One JSON line per (family, num_envs).
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


def rate_for(env_name, env_config, num_envs, n_steps, key, action_spec):
    """action_spec: ("discrete", n) or ("box", low, high, dim)."""
    from warpdrive_tpu.envs.engine import EnvEngine

    eng = EnvEngine(env_obj=None, env_name=env_name,
                    env_config=env_config, num_envs=num_envs, seed=5)
    n_agents = eng.n_agents
    step = eng.step  # pure batched step (writes actions, vmaps env)
    auto_reset = eng.auto_reset

    def one_step(state, k):
        k_act, k_reset = jax.random.split(k)
        if action_spec[0] == "discrete":
            actions = jax.random.randint(
                k_act, (num_envs, n_agents), 0, action_spec[1],
                dtype=jnp.int32)
        else:
            _, low, high, dim = action_spec
            actions = jax.random.uniform(
                k_act, (num_envs, n_agents, dim), minval=low, maxval=high,
                dtype=jnp.float32)
        state = step(state, actions)
        return auto_reset(state, k_reset), None

    @jax.jit
    def run(state, k):
        return jax.lax.scan(one_step, state, jax.random.split(k, n_steps))[0]

    state = dict(eng.state)
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    state = run(state, sub)
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    compile_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(3):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state = run(state, sub)
        jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
        best = max(best, n_steps * num_envs / (time.perf_counter() - t0))
    return best, compile_s


def main():
    emit(stage="start", platform=jax.devices()[0].platform)
    from warpdrive_tpu.envs import register_all_envs

    register_all_envs()
    key = jax.random.PRNGKey(123)

    cases = [
        ("ClassicControlCartPoleEnv", {"episode_length": 500},
         ("discrete", 2), [10_000, 100_000]),
        ("ClassicControlAcrobotEnv", {"episode_length": 500},
         ("discrete", 3), [10_000, 100_000]),
        ("ClassicControlPendulumEnv", {"episode_length": 500},
         ("box", -2.0, 2.0, 1), [10_000, 100_000]),
        ("ClassicControlMountainCarEnv", {"episode_length": 500},
         ("discrete", 3), [10_000, 100_000]),
        ("TagGridWorld", {"num_taggers": 4, "grid_length": 20,
                          "episode_length": 100, "seed": 3,
                          "use_full_observation": False},
         ("discrete", 5), [2_000, 10_000]),
    ]
    for env_name, cfg, aspec, env_counts in cases:
        for ne in env_counts:
            try:
                key, sub = jax.random.split(key)
                r, c = rate_for(env_name, cfg, ne, 500, sub, aspec)
                emit(stage="env_only", env=env_name, num_envs=ne,
                     env_steps_per_s=round(r), compile_s=round(c, 1))
            except Exception as e:  # noqa: BLE001
                emit(stage="env_only", env=env_name, num_envs=ne,
                     error=f"{type(e).__name__}: {e}"[:200])
    emit(stage="done")


if __name__ == "__main__":
    main()
