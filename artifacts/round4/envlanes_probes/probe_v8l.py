"""P10a: jit(v8 raw_out -> sum) — no slice/transpose epilogue.
P10b: jit(v8 raw -> optimization_barrier -> slice/transpose -> sum)."""
import time, sys, json, functools
import jax, jax.numpy as jnp
import numpy as np
print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
import warpdrive_tpu.ops.knn_obs as K

E, N, k = 1000, 105, 10
obs_dim = 8 * k + 1
rng = np.random.RandomState(1)
feats = jnp.asarray(rng.rand(E, 5, N).astype(np.float32))
types = jnp.asarray((rng.rand(N) > 0.5).astype(np.float32))
still = jnp.ones((E, N), jnp.float32)
t_norm = jnp.zeros((E,), jnp.float32)
lx = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)
ly = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)

raw = functools.partial(
    K._knn_observation_envlanes, n_agents=N, k=k, interpret=False,
    variant="envlanes_exact", raw_out=True)

def stamp(label, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"probe": label,
                      "compile_plus_run_s": round(time.time() - t0, 1)}),
          flush=True)

stamp("P10a_raw_sum",
      jax.jit(lambda a, b: raw(a, b, feats, types, still, t_norm).sum()),
      lx, ly)

def with_barrier(a, b):
    o = raw(a, b, feats, types, still, t_norm)
    o = jax.lax.optimization_barrier(o)
    return jnp.transpose(o[:N, :obs_dim, :E], (2, 0, 1)).sum()
stamp("P10b_barrier_then_transpose_sum", jax.jit(with_barrier), lx, ly)
print("V8L_PROBE_OK", flush=True)
