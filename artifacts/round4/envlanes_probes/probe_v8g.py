"""EAGER kernel-only timing, obs CONSUMED in the chain (forces real
execution per repeat), E=8000."""
import time, sys, json
import jax, jax.numpy as jnp
import numpy as np
print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from warpdrive_tpu.ops.knn_obs import knn_observation

E, N, k = 8000, 105, 10
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.rand(E, 5, N).astype(np.float32))
types = jnp.asarray((rng.rand(N) > 0.5).astype(np.float32))
still = jnp.ones((E, N), jnp.float32)
t_norm = jnp.zeros((E,), jnp.float32)
lx0 = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)
ly0 = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)

def run(variant, REP=30):
    lx = lx0
    obs = knn_observation(lx, ly0, feats, types, still, t_norm,
                          n_agents=N, k=k, variant=variant)
    (obs.sum()).block_until_ready()
    t0 = time.time()
    for r in range(REP):
        obs = knn_observation(lx, ly0, feats, types, still, t_norm,
                              n_agents=N, k=k, variant=variant)
        lx = lx + obs[:, 0, 0:1] * np.float32(1e-6)  # consume obs
    jax.block_until_ready(lx)
    return (time.time() - t0) / REP * 1000

# measure twice per variant, interleaved rounds, report the best —
# kills order effects
res = {}
for rnd in range(2):
    for variant in ("envlanes", "envlanes_exact", "tiled_exact", "tiled",
                    "mxu_exact", "mxu"):
        try:
            ms = run(variant)
            res.setdefault(variant, []).append(ms)
        except Exception as e:
            print(json.dumps({"variant": variant,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
for v, times in res.items():
    print(json.dumps({"variant": v,
                      "eager_ms_8k": [round(t, 3) for t in times],
                      "us_per_1k_envs": round(min(times) / 8 * 1000, 1)}),
          flush=True)
print("V8G_PROBE_OK", flush=True)
