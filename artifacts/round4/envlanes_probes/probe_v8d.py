"""Kernel-only observe timing: envlanes vs tiled vs mxu (E=1000 flagship
geometry). Fresh-ish inputs each repeat (chained) to defeat the tunnel
memoizer; jit around ONE call (no scan)."""
import time, sys, json
import jax, jax.numpy as jnp
import numpy as np
print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from warpdrive_tpu.ops.knn_obs import knn_observation

E, N, k = 1000, 105, 10
rng = np.random.RandomState(0)
base = dict(
    feats=jnp.asarray(rng.rand(E, 5, N).astype(np.float32)),
    types=jnp.asarray((rng.rand(N) > 0.5).astype(np.float32)),
    still=jnp.ones((E, N), jnp.float32),
    t_norm=jnp.zeros((E,), jnp.float32),
)
lx0 = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)
ly0 = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)

def make(variant):
    @jax.jit
    def f(lx, ly):
        obs = knn_observation(lx, ly, base["feats"], base["types"],
                              base["still"], base["t_norm"],
                              n_agents=N, k=k, variant=variant)
        s = obs.sum() * 1e-7
        return lx + s, ly - s, obs
    return f

for variant in ("envlanes_exact", "envlanes", "tiled_exact", "tiled",
                "mxu_exact", "mxu"):
    try:
        f = make(variant)
        t0 = time.time()
        lx, ly, obs = f(lx0, ly0)
        jax.block_until_ready(obs)
        comp = time.time() - t0
        REP = 200
        t0 = time.time()
        for _ in range(REP):
            lx, ly, obs = f(lx, ly)
        jax.block_until_ready(obs)
        ms = (time.time() - t0) / REP * 1000
        print(json.dumps({"variant": variant, "observe_ms_per_call":
                          round(ms, 4), "compile_s": round(comp, 1),
                          "env_rate_if_observe_only": round(E / ms * 1000)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"variant": variant,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)
print("V8D_PROBE_OK", flush=True)
