"""Round-5: classic-control 131K-replica (2^17, lane-aligned; r5_ab14 follow-up) envelope (reference
CHANGELOG.md:8-17 claim class) with the lane-packed batched steppers —
all five envs, env-only fused scans, dispersion protocol."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from bench import rollout_rate_stats
from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.utils.env_registrar import env_registrar
from warpdrive_tpu.utils.constants import Constants as _C

register_all_envs()
OUT = "/root/repo/artifacts/round5/r5_classic_envelope_131k.jsonl"
E, STEPS = 131_072, 500

ENVS = [
    ("ClassicControlCartPoleEnv", 2, None),
    ("ClassicControlMountainCarEnv", 3, None),
    ("ClassicControlContinuousMountainCarEnv", None, 1.0),
    ("ClassicControlAcrobotEnv", 3, None),
    ("ClassicControlPendulumEnv", None, 2.0),
]

for name, n_act, a_scale in ENVS:
    try:
        cls = env_registrar.get(name, backend="tpu")
        eng = EnvEngine(env_obj=cls(episode_length=200, seed=5),
                        num_envs=E, seed=5)
        state = dict(eng.state)

        def step(carry, key, eng=eng, n_act=n_act, a_scale=a_scale):
            st, checksum = carry
            k_act, k_reset = jax.random.split(key)
            if n_act is not None:
                actions = jax.random.randint(
                    k_act, (E, 1), 0, n_act, dtype=jnp.int32)
            else:
                actions = jax.random.uniform(
                    k_act, (E, 1, 1), minval=-a_scale, maxval=a_scale,
                    dtype=jnp.float32)
            st = eng.step(st, actions)
            checksum = checksum + st[_C.OBSERVATIONS].sum()
            return eng.auto_reset(st, k_reset), checksum

        t0 = time.time()
        st = rollout_rate_stats(step, (state, jnp.zeros(())), STEPS, E,
                                jax.random.PRNGKey(42), repeats=5)
        rec = {"env": name, "num_envs": E,
               "median": round(st["value"]), "min": round(st["min"]),
               "max": round(st["max"]), "n": st["n"],
               "batched_stepper": hasattr(eng.env, "step_batch_fn"),
               "wall_s": round(time.time() - t0, 1)}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
    except Exception as e:
        rec = {"env": name, "error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
print("ENVELOPE_DONE", flush=True)
