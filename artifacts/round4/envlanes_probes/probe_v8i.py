"""P4: jit(knn+sum); P5: jit(knn+matmul consumer); P6: 10-step scan
without consuming obs in the carry."""
import time, sys, json, functools
import jax, jax.numpy as jnp
import numpy as np
print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from warpdrive_tpu.ops.knn_obs import knn_observation

E, N, k = 1000, 105, 10
rng = np.random.RandomState(1)
feats = jnp.asarray(rng.rand(E, 5, N).astype(np.float32))
types = jnp.asarray((rng.rand(N) > 0.5).astype(np.float32))
still = jnp.ones((E, N), jnp.float32)
t_norm = jnp.zeros((E,), jnp.float32)
lx = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)
ly = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)
W = jnp.asarray(rng.rand(81, 16).astype(np.float32))

def knn(a, b):
    return knn_observation(a, b, feats, types, still, t_norm,
                           n_agents=N, k=k, variant="envlanes_exact")

def stamp(label, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"probe": label,
                      "compile_plus_run_s": round(time.time() - t0, 1)}),
          flush=True)

stamp("P4_knn_sum", jax.jit(lambda a, b: knn(a, b).sum()), lx, ly)
stamp("P5_knn_matmul", jax.jit(lambda a, b: (knn(a, b) @ W).sum()), lx, ly)

def body(c, _):
    a, b = c
    o = knn(a, b)
    return (a + o[:, 0, 0] * 1e-6, b), None
stamp("P6_scan10_slice_consume",
      jax.jit(lambda c: jax.lax.scan(body, c, None, length=10)), (lx, ly))
print("V8I_PROBE_OK", flush=True)
