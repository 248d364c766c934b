"""EAGER kernel-only timing at E=8000 (device time >> dispatch floor)."""
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

for variant in ("envlanes", "tiled_exact", "tiled", "mxu_exact", "mxu",
                "envlanes_exact"):
    try:
        lx = lx0
        obs = knn_observation(lx, ly0, feats, types, still, t_norm,
                              n_agents=N, k=k, variant=variant)
        obs.block_until_ready()
        REP = 50
        t0 = time.time()
        for r in range(REP):
            lx = lx + np.float32(1e-5)
            obs = knn_observation(lx, ly0, feats, types, still, t_norm,
                                  n_agents=N, k=k, variant=variant)
        obs.block_until_ready()
        ms = (time.time() - t0) / REP * 1000
        print(json.dumps({"variant": variant,
                          "eager_ms_per_call_8k": round(ms, 4),
                          "us_per_1k_envs": round(ms / 8 * 1000, 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"variant": variant,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)
print("V8F_PROBE_OK", flush=True)
