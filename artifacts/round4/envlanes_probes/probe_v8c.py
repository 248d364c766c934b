import time, sys
import jax, jax.numpy as jnp
import numpy as np
print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
from warpdrive_tpu.ops.knn_obs import knn_observation

E, N, k = 1000, 105, 10
rng = np.random.RandomState(0)
loc_x = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)
loc_y = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)
feats = jnp.asarray(rng.rand(E, 5, N).astype(np.float32))
types = jnp.asarray((rng.rand(N) > 0.5).astype(np.float32))
still = jnp.ones((E, N), jnp.float32)
t_norm = jnp.zeros((E,), jnp.float32)

def body(carry, _):
    lx, ly, acc = carry
    obs = knn_observation(lx, ly, feats, types, still, t_norm,
                          n_agents=N, k=k, variant="envlanes_exact")
    s = obs.sum()
    return (lx + 1e-6 * s, ly - 1e-6 * s, acc + s), None

for steps in (10, 500):
    t0 = time.time()
    fn = jax.jit(lambda c: jax.lax.scan(body, c, None, length=steps))
    out, _ = fn((loc_x, loc_y, jnp.zeros(())))
    jax.block_until_ready(out[2])
    print(f"scan {steps} compile+run", round(time.time()-t0, 1), "s",
          flush=True)
print("V8C_PROBE_OK", flush=True)
