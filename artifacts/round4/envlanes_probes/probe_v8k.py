"""P9: v8 with SWAPPED grid order (g major, e minor) => grid axis 0
maps to output dim 0 like the working v7; consumer = sum."""
import time, sys, json, functools
import jax, jax.numpy as jnp
import numpy as np
print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
import warpdrive_tpu.ops.knn_obs as K
from warpdrive_tpu.ops.knn_obs import LANE
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

E, N, k = 1000, 105, 10
rng = np.random.RandomState(1)
feats = jnp.asarray(rng.rand(E, 5, N).astype(np.float32))
types = jnp.asarray((rng.rand(N) > 0.5).astype(np.float32))
still = jnp.ones((E, N), jnp.float32)
t_norm = jnp.zeros((E,), jnp.float32)
lx = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)
ly = jnp.asarray(rng.rand(E, N).astype(np.float32) * 20)

def envlanes_swapped(loc_x, loc_y, feats, types_f, still_f, t_norm,
                     *, n_agents, k, exact=True):
    E, N = loc_x.shape
    obs_dim = 8 * k + 1
    obs_rows_pad = ((obs_dim + 7) // 8) * 8
    SUBn = ((N + 7) // 8) * 8
    G = SUBn // 8
    f32 = jnp.float32
    EP = ((E + LANE - 1) // LANE) * LANE
    pad_e, pad_j = EP - E, SUBn - N

    def to_lanes(a):
        a = jnp.transpose(a, (1, 2, 0))
        return jnp.pad(a, ((0, 0), (0, pad_j), (0, pad_e)))

    xyT = to_lanes(jnp.stack([loc_x.astype(f32), loc_y.astype(f32)], 1))
    srcT = to_lanes(jnp.concatenate(
        [feats.astype(f32),
         jnp.broadcast_to(types_f[None, None, :], (E, 1, N)),
         still_f.astype(f32)[:, None, :],
         jnp.broadcast_to(t_norm.astype(f32)[:, None, None], (E, 1, N))],
        axis=1))

    # kernel expects program_id(1) = g; with swapped grid g is axis 0
    def kern(cxy, csrc, oxy, osrc, out):
        # delegate to the original body but with g from axis 0
        import warpdrive_tpu.ops.knn_obs as KK
        real_pid = pl.program_id
        K._knn_obs_kernel_v8.__wrapped__ if hasattr(K._knn_obs_kernel_v8, "__wrapped__") else None
        # inline: temporarily monkeypatch program_id axis mapping
        raise SystemExit("unused")

    # simpler: reuse the original kernel, but give it grid=(G, EP//LANE)
    # and swap the index maps; the kernel reads pl.program_id(1) as g —
    # with swapped grid, axis 1 is e, so we need a tiny wrapper kernel
    # that can't be expressed without editing the kernel. Instead:
    # patched kernel with g = pl.program_id(0).
    import types as _t
    src_fn = K._knn_obs_kernel_v8
    import inspect, textwrap
    code = inspect.getsource(src_fn)
    code = code.replace("g = pl.program_id(1)", "g = pl.program_id(0)")
    code = code.replace("def _knn_obs_kernel_v8", "def _v8_swapped")
    ns = dict(vars(K))
    exec(textwrap.dedent(code), ns)
    kernel = functools.partial(ns["_v8_swapped"], n_agents=n_agents, k=k,
                               exact=exact)
    out = pl.pallas_call(
        kernel,
        grid=(G, EP // LANE),
        in_specs=[
            pl.BlockSpec((2, SUBn, LANE), lambda g, e: (0, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, SUBn, LANE), lambda g, e: (0, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 8, LANE), lambda g, e: (0, g, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8, LANE), lambda g, e: (0, g, e),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, obs_rows_pad, LANE),
                               lambda g, e: (g, 0, e),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUBn, obs_rows_pad, EP), f32),
    )(xyT, srcT, xyT, srcT)
    return jnp.transpose(out[:N, :obs_dim, :E], (2, 0, 1))

def stamp(label, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"probe": label,
                      "compile_plus_run_s": round(time.time() - t0, 1)}),
          flush=True)

f = jax.jit(lambda a, b: envlanes_swapped(
    a, b, feats, types, still, t_norm, n_agents=N, k=k).sum())
stamp("P9_swapped_grid_sum", f, lx, ly)
print("V8K_PROBE_OK", flush=True)
