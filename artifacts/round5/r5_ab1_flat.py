"""Round-5 A/B #1: the v9 flat-emit kNN kernel vs the round-4 kernels.

Flagship env-only scan rates @E=2000 (the BENCH_r04 headline config:
pallas_mxu_exact 1.062M env-steps/s) for:

  * controls: pallas_mxu_exact (r4 headline), pallas_tiled_exact,
    pallas_tiled (fast class)
  * v9: pallas_flat_exact / pallas_flat (packed ties)
  * v9 + hoisted-prep MXU distance build: pallas_flat_mxudist[_exact]
  * raw-consumption mode: flat_exact with raw_out=True consumed without
    the contract transpose (the layout a flat-aware policy would eat)
  * block-size sweep for the winner

lax.scan with fresh keys per repeat + value fetch per repeat
(CLAUDE.md rules 5/7).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

sys.path.insert(0, "/root/repo")
from bench import rollout_rate  # noqa: E402
from warpdrive_tpu.presets import build_flagship  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab1_results.jsonl"
N_STEPS = 500
E = 2000


def emit(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def measure(algo, block_envs=2, num_envs=E, tag=None):
    sys_ = build_flagship(num_envs=num_envs, fc_dims=(256, 256), seed=0,
                          knn_algorithm=algo)
    sys_["env"].knn_block_envs = block_envs  # read at trace time
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    rate = rollout_rate(sys_["env_only_step"],
                        (sys_["state"], jnp.zeros(())), N_STEPS,
                        num_envs, key)
    rec = {"algo": tag or algo, "block_envs": block_envs,
           "num_envs": num_envs, "env_steps_per_sec": round(rate),
           "wall_s": round(time.time() - t0, 1)}
    emit(rec)
    return rate


def measure_raw(variant="flat_exact", block_envs=2, num_envs=E):
    """Env-only scan consuming the kernel's RAW flat layout (no contract
    transpose) — the production ceiling for flat-aware consumers."""
    from warpdrive_tpu.ops.knn_obs import knn_observation
    from warpdrive_tpu.utils.constants import Constants as _C

    sys_ = build_flagship(num_envs=num_envs, fc_dims=(256, 256), seed=0,
                          knn_algorithm="pallas_flat_exact")
    env = sys_["env"]
    env.knn_block_envs = block_envs
    engine = sys_["engine"]
    n_agents = engine.n_agents
    heads = [int(n) for n in env.action_space[0].nvec]
    types_f = jnp.asarray(env.agent_types, dtype=jnp.float32)
    eps = np.float32(1e-10)

    def env_only_step_raw(carry, key):
        state, checksum = carry
        k_act, k_reset = jax.random.split(key)
        mins = jnp.zeros((len(heads),), dtype=jnp.int32)
        maxs = jnp.asarray(heads, dtype=jnp.int32)
        actions = jax.random.randint(
            k_act, (num_envs, n_agents, len(heads)), mins, maxs,
            dtype=jnp.int32)
        feats = jnp.stack(
            [state["loc_x"] / env.grid_diagonal,
             state["loc_y"] / env.grid_diagonal,
             state["speed"] / (env.max_speed + eps),
             state["acceleration"] / (env.max_speed + eps),
             state["direction"] / np.float32(2 * np.pi)],
            axis=1)
        raw = knn_observation(
            state["loc_x"], state["loc_y"], feats, types_f,
            state["still_in_the_game"].astype(jnp.float32),
            (state[_C.TIMESTEP] / env.episode_length).astype(jnp.float32),
            n_agents=n_agents, k=env.num_other_agents_observed,
            block_envs=block_envs, variant=variant, raw_out=True)
        checksum = checksum + raw.sum()
        state = engine.step_physics(state, actions)
        return engine.auto_reset(state, k_reset), checksum

    key = jax.random.PRNGKey(43)
    t0 = time.time()
    rate = rollout_rate(env_only_step_raw,
                        (sys_["state"], jnp.zeros(())), N_STEPS,
                        num_envs, key)
    rec = {"algo": f"{variant}_RAW", "block_envs": block_envs,
           "num_envs": num_envs, "env_steps_per_sec": round(rate),
           "wall_s": round(time.time() - t0, 1)}
    emit(rec)
    return rate


CONFIGS = [
    ("pallas_mxu_exact", 2),      # r4 headline control
    ("pallas_flat_exact", 2),     # v9 exact
    ("pallas_flat", 2),           # v9 packed ties
    ("pallas_flat_mxudist_exact", 2),  # route (b) retry, hoisted prep
    ("pallas_flat_mxudist", 2),
    ("pallas_tiled", 2),          # r4 fast control
]

for algo, be in CONFIGS:
    try:
        measure(algo, block_envs=be)
    except Exception as e:
        emit({"algo": algo, "block_envs": be,
              "error": f"{type(e).__name__}: {str(e)[:300]}"})

# raw-consumption mode for the exact winner class
for variant in ["flat_exact", "flat"]:
    try:
        measure_raw(variant=variant, block_envs=2)
    except Exception as e:
        emit({"algo": f"{variant}_RAW",
              "error": f"{type(e).__name__}: {str(e)[:300]}"})

# block sweep on the flat exact kernel (VMEM diet may move the optimum)
for be in [4, 8]:
    try:
        measure("pallas_flat_exact", block_envs=be)
    except Exception as e:
        emit({"algo": "pallas_flat_exact", "block_envs": be,
              "error": f"{type(e).__name__}: {str(e)[:300]}"})

print("AB1_DONE", flush=True)
