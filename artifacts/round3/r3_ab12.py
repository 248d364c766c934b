"""Round-3 TPU A/B #12: 1024-agent TagContinuous env-only — env count x
kNN algorithm sweep (bench stage runs approx @ E=16 = 3.9K env-steps/s;
is that the optimum?)."""

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r3_ab12_results.jsonl")
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

    print("[ab12] acquiring device...", flush=True)
    print(f"[ab12] device: {jax.devices()[0].platform}", flush=True)

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
    from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS
    from bench import rollout_rate

    key = jax.random.PRNGKey(12)

    def rate(algo, E, steps=100):
        env = TpuTagContinuous(**dict(
            FLAGSHIP_ENV_KWARGS, num_taggers=20, num_runners=1004,
            grid_length=60.0, seed=0, knn_algorithm=algo,
            knn_select="bf16pair"))
        eng = EnvEngine(env_obj=env, num_envs=E, seed=0)
        state = {k: v for k, v in eng.state.items()
                 if k not in ("observations", "sampled_actions")}
        A = eng.n_agents
        heads = [int(n) for n in env.action_space[0].nvec]

        def env_step(carry, kk):
            st, checksum = carry
            k_act, k_reset = jax.random.split(kk)
            actions = jax.random.randint(
                k_act, (E, A, len(heads)),
                jnp.zeros((len(heads),), jnp.int32),
                jnp.asarray(heads, jnp.int32), dtype=jnp.int32)
            checksum = checksum + eng.observe(st).sum()
            st = eng.step_physics(st, actions)
            return eng.auto_reset(st, k_reset), checksum

        return rollout_rate(env_step, (state, jnp.zeros(())), steps, E, key)

    for algo, E in [("approx", 16), ("approx", 64), ("approx", 128),
                    ("ladder", 64), ("packed", 64)]:
        try:
            t0 = time.time()
            r = rate(algo, E)
            emit({"stage": "agents1024", "algo": algo, "num_envs": E,
                  "env_steps_per_sec": round(r),
                  "agent_steps_per_sec": round(r * 1024),
                  "elapsed_s": round(time.time() - t0, 1)})
        except Exception as exc:
            emit({"stage": "agents1024", "algo": algo, "num_envs": E,
                  "error": f"{type(exc).__name__}: {exc}"})
    emit({"stage": "done"})


if __name__ == "__main__":
    main()
