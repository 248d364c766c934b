"""r5_ab14: lane-aligned replica counts for the fast-env stages.

Follow-up to the r5_ab12/ab13 E=1024 flagship find: the gridworld
stage runs E=32000 (32000/128 = 250 exact sublane tiles of 8, but not
a power of two) and CartPole E=100000 (100000/128 = 781.25 — NOT
lane-aligned, so the trailing tile is ragged).  A/B the bench stages
at lane-aligned / power-of-two counts.  Rates are absolute
env-steps/s; 5 fresh-key chained repeats, value-fetch per repeat,
2000-step (gridworld) / 500-step (CartPole) scans per the bench's
dispatch-amortization protocol."""
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rollout_rate_stats  # noqa: E402
from warpdrive_tpu.envs.engine import EnvEngine  # noqa: E402
from warpdrive_tpu.utils.constants import Constants as _C  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab14_results.jsonl"


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def gridworld(ge_envs):
    from warpdrive_tpu.envs.tag_gridworld import TpuTagGridWorld

    genv = TpuTagGridWorld(
        num_taggers=4, grid_length=20, episode_length=100, seed=7,
        use_full_observation=False,
    )
    gengine = EnvEngine(env_obj=genv, num_envs=ge_envs, seed=7)
    g_state = dict(gengine.state)
    g_nact = genv.action_space[0].n
    g_nagents = gengine.n_agents

    def g_env_step(carry, key):
        state, checksum = carry
        k_act, k_reset = jax.random.split(key)
        actions = jax.random.randint(
            k_act, (ge_envs, g_nagents), 0, g_nact, dtype=jnp.int32
        )
        state = gengine.step(state, actions)
        checksum = checksum + state[_C.OBSERVATIONS].sum()
        return gengine.auto_reset(state, k_reset), checksum

    stats = rollout_rate_stats(
        g_env_step, (g_state, jnp.zeros(())), 2000, ge_envs,
        jax.random.PRNGKey(3), repeats=5,
    )
    emit({"stage": "gridworld_env_only", "num_envs": ge_envs,
          **{k: round(v) for k, v in stats.items()}})


def cartpole(c_envs):
    from warpdrive_tpu.envs.classic_control.cartpole import (
        TpuClassicControlCartPoleEnv,
    )

    cenv = TpuClassicControlCartPoleEnv(episode_length=200, seed=5)
    cengine = EnvEngine(env_obj=cenv, num_envs=c_envs, seed=5)
    c_state = dict(cengine.state)

    def c_env_step(carry, key):
        state, checksum = carry
        k_act, k_reset = jax.random.split(key)
        actions = jax.random.randint(
            k_act, (c_envs, 1), 0, 2, dtype=jnp.int32
        )
        state = cengine.step(state, actions)
        checksum = checksum + state[_C.OBSERVATIONS].sum()
        return cengine.auto_reset(state, k_reset), checksum

    stats = rollout_rate_stats(
        c_env_step, (c_state, jnp.zeros(())), 500, c_envs,
        jax.random.PRNGKey(4), repeats=5,
    )
    emit({"stage": "cartpole_env_only", "num_envs": c_envs,
          **{k: round(v) for k, v in stats.items()}})


def main():
    print("acquiring device...", flush=True)
    print(f"device: {jax.devices()[0].platform}", flush=True)
    for e in (32768, 32000):
        gridworld(e)
    for e in (131072, 102400, 100000):
        cartpole(e)
    print("done", flush=True)


if __name__ == "__main__":
    main()
