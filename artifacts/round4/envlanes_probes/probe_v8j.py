"""P7: optimization_barrier between v8 pallas output and the sum
consumer. If this compiles+runs, bake the barrier into the dispatcher."""
import time, sys, json
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

def knn(a, b):
    o = knn_observation(a, b, feats, types, still, t_norm,
                        n_agents=N, k=k, variant="envlanes_exact")
    return jax.lax.optimization_barrier(o)

def stamp(label, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"probe": label,
                      "compile_plus_run_s": round(time.time() - t0, 1)}),
          flush=True)

stamp("P7_barrier_sum", jax.jit(lambda a, b: knn(a, b).sum()), lx, ly)

def body(c, _):
    a, b = c
    o = knn(a, b)
    return (a + o.sum() * 1e-9, b), None
stamp("P8_barrier_scan10",
      jax.jit(lambda c: jax.lax.scan(body, c, None, length=10)), (lx, ly))
print("V8J_PROBE_OK", flush=True)
