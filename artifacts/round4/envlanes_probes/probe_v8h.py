"""Bisect the v8-under-jit hang: P1 jit(raw pallas only, pre-transposed
inputs); P2 jit(in-transposes + pallas, raw out); P3 full
jit(knn_observation raw_out=False)."""
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

def stamp(label, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"probe": label,
                      "compile_plus_run_s": round(time.time() - t0, 1)}),
          flush=True)

# P2: transposes + pallas (raw out, no output transpose)
f2 = jax.jit(functools.partial(
    K._knn_observation_envlanes, n_agents=N, k=k, interpret=False,
    variant="envlanes_exact", raw_out=True))
stamp("P2_intrans_pallas_rawout", f2, lx, ly, feats, types, still, t_norm)

# P3: the full thing (output transpose too)
f3 = jax.jit(functools.partial(
    K._knn_observation_envlanes, n_agents=N, k=k, interpret=False,
    variant="envlanes_exact", raw_out=False))
stamp("P3_full", f3, lx, ly, feats, types, still, t_norm)

print("V8H_PROBE_OK", flush=True)
