"""Round-3 TPU A/B #11: TagGridWorld ENV-ONLY rate vs env count (the
bench stage runs 2000; training swept in ab10 says big fleets amortize)."""

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r3_ab11_results.jsonl")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def emit(obj):
    line = json.dumps(obj)
    print("[RESULT] " + line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main():
    import jax
    import jax.numpy as jnp

    print("[ab11] acquiring device...", flush=True)
    print(f"[ab11] device: {jax.devices()[0].platform}", flush=True)

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_gridworld import TpuTagGridWorld
    from warpdrive_tpu.utils.constants import Constants as _C
    from bench import rollout_rate

    key = jax.random.PRNGKey(99)
    for E in (2000, 8000, 32000, 64000):
        try:
            t0 = time.time()
            env = TpuTagGridWorld(
                num_taggers=4, grid_length=20, episode_length=100, seed=7,
                use_full_observation=False,
            )
            eng = EnvEngine(env_obj=env, num_envs=E, seed=7)
            state = dict(eng.state)
            A = eng.n_agents
            n_act = env.action_space[0].n

            def env_step(carry, kk, eng=eng, E=E, A=A, n_act=n_act):
                st, checksum = carry
                k_act, k_reset = jax.random.split(kk)
                actions = jax.random.randint(
                    k_act, (E, A), 0, n_act, dtype=jnp.int32)
                st = eng.step(st, actions)
                checksum = checksum + st[_C.OBSERVATIONS].sum()
                return eng.auto_reset(st, k_reset), checksum

            r = rollout_rate(env_step, (state, jnp.zeros(())), 500, E, key)
            emit({"stage": "gridworld_env_only", "num_envs": E,
                  "env_steps_per_sec": round(r),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "gridworld_env_only", "num_envs": E,
                  "error": f"{type(exc).__name__}: {exc}"})
    emit({"stage": "done"})


if __name__ == "__main__":
    main()
