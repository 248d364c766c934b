"""P11: fetch the v8 output VALUES to host (np.asarray) — does the
kernel actually execute at all?"""
import time, sys, json, functools
import jax, jax.numpy as jnp
import numpy as np
print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
import warpdrive_tpu.ops.knn_obs as K

E, N, k = 1000, 105, 10
rng = np.random.RandomState(1)
feats = jnp.asarray(rng.rand(E, 5, N).astype(np.float32))
types = jnp.asarray((rng.rand(N) > 0.5).astype(np.float32))
still = jnp.ones((E, N), jnp.float32)
t_norm = jnp.zeros((E,), jnp.float32)
lx = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)
ly = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)

f = jax.jit(functools.partial(
    K._knn_observation_envlanes, n_agents=N, k=k, interpret=False,
    variant="envlanes_exact", raw_out=False))
t0 = time.time()
out = f(lx, ly, feats, types, still, t_norm)
jax.block_until_ready(out)
print(json.dumps({"probe": "P11_jit_return",
                  "compile_plus_run_s": round(time.time() - t0, 1)}),
      flush=True)
t0 = time.time()
host = np.asarray(out)
print(json.dumps({"probe": "P11_fetch", "fetch_s":
                  round(time.time() - t0, 1),
                  "mean": float(host.mean())}), flush=True)
print("V8M_PROBE_OK", flush=True)
