"""Round-4 A/B #3: 1024-agent TagContinuous on the FUSED multi-tile
kernel vs the round-3 XLA exact-ladder bench choice (VERDICT r3 next #3).

The v7 tiled kernel keeps the 4 MB/env distance matrix VMEM-resident per
(env, observer-tile) block instead of re-reading it from HBM per ladder
pass, and lifts E past the round-3 materialization cap.
"""
import json, time, sys
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

sys.path.insert(0, "/root/repo")
from bench import rollout_rate
from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS as _FK

OUT = "/root/repo/artifacts/round4/r4_ab3_results.jsonl"

def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")

def measure(algo, num_envs, steps=100):
    aenv = TpuTagContinuous(**dict(
        _FK, num_taggers=20, num_runners=1004, grid_length=60.0,
        seed=0, knn_algorithm=algo, knn_select="bf16pair"))
    eng = EnvEngine(env_obj=aenv, num_envs=num_envs, seed=0)
    st = {k: v for k, v in eng.state.items()
          if k not in ("observations", "sampled_actions")}
    A = eng.n_agents
    heads = [int(n) for n in aenv.action_space[0].nvec]

    def env_step(carry, kk):
        s, checksum = carry
        k_act, k_reset = jax.random.split(kk)
        actions = jax.random.randint(
            k_act, (num_envs, A, len(heads)),
            jnp.zeros((len(heads),), jnp.int32),
            jnp.asarray(heads, jnp.int32), dtype=jnp.int32)
        checksum = checksum + eng.observe(s).sum()
        s = eng.step_physics(s, actions)
        return eng.auto_reset(s, k_reset), checksum

    t0 = time.time()
    rate = rollout_rate(env_step, (st, jnp.zeros(())), steps, num_envs,
                        jax.random.PRNGKey(3))
    log({"algo": algo, "num_envs": num_envs,
         "env_steps_per_sec": round(rate),
         "agent_steps_per_sec": round(rate * A),
         "wall_s": round(time.time() - t0, 1)})
    return rate

# fused tiled kernel first (the new capability), then the r3 choice for
# a same-session control, then E scaling for the winner
for algo, E in [
    ("pallas_tiled_exact", 64),
    ("ladder", 64),
    ("pallas_tiled_exact", 128),
    ("pallas_tiled_exact", 256),
    ("pallas_tiled", 64),
    ("pallas_mxudist_exact", 64),
]:
    try:
        measure(algo, E)
    except Exception as e:
        log({"algo": algo, "num_envs": E,
             "error": f"{type(e).__name__}: {e}"[:300]})
print("AB3_DONE", flush=True)
