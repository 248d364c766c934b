"""EAGER kernel-only observe timing (no jit): envlanes vs tiled vs mxu.
Same eager dispatch overhead for all variants => fair relative compare.
Inputs perturbed on device each repeat (cheap eager add) to defeat the
tunnel memoizer."""
import time, sys, json
import jax, jax.numpy as jnp
import numpy as np
print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from warpdrive_tpu.ops.knn_obs import knn_observation

E, N, k = 1000, 105, 10
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.rand(E, 5, N).astype(np.float32))
types = jnp.asarray((rng.rand(N) > 0.5).astype(np.float32))
still = jnp.ones((E, N), jnp.float32)
t_norm = jnp.zeros((E,), jnp.float32)
lx0 = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)
ly0 = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)

for variant in ("envlanes_exact", "envlanes", "tiled_exact", "tiled",
                "mxu_exact", "mxu"):
    try:
        lx, ly = lx0, ly0
        obs = knn_observation(lx, ly, feats, types, still, t_norm,
                              n_agents=N, k=k, variant=variant)
        obs.block_until_ready()
        REP = 100
        t0 = time.time()
        for r in range(REP):
            lx = lx + np.float32(1e-5)
            obs = knn_observation(lx, ly, feats, types, still, t_norm,
                                  n_agents=N, k=k, variant=variant)
        obs.block_until_ready()
        ms = (time.time() - t0) / REP * 1000
        print(json.dumps({"variant": variant,
                          "eager_ms_per_call": round(ms, 4)}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": variant,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)
print("V8E_PROBE_OK", flush=True)
