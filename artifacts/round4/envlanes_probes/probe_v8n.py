"""K1: v8 body with the dynamic sublane store replaced by a STATIC
store to rows 0..8 (wrong results, isolates the wedge).
K2: K1 but also without the t_row / pad partial stores.
Each fetched to host with a watchdog between probes."""
import time, sys, json, functools
import jax, jax.numpy as jnp
import numpy as np
print("devices:", jax.devices(), flush=True)
sys.path.insert(0, "/root/repo")
import warpdrive_tpu.ops.knn_obs as K
from warpdrive_tpu.ops.knn_obs import LANE, _BIG, _VALID_MAX
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

import inspect, textwrap

def make_variant(tag, static_store, strip_tail):
    code = inspect.getsource(K._knn_obs_kernel_v8)
    code = code.replace("def _knn_obs_kernel_v8", f"def _v8_{tag}")
    if static_store:
        code = code.replace(
            "out_ref[:, pl.ds(pl.multiple_of(slot * 8, 8), 8), :] = rows8",
            "out_ref[:, 0:8, :] = rows8")
    if strip_tail:
        code = code.replace(
            "t_row = own_chan(7) * alive_own", "t_row = None")
        code = code.replace("out_ref[:, 8 * k : 8 * k + 1, :] = t_row",
                            "pass")
        code = code.replace("if pad_rows:", "if False:")
    ns = dict(vars(K))
    exec(textwrap.dedent(code), ns)
    return ns[f"_v8_{tag}"]

def run(tag, kernel_fn):
    obs_rows_pad = 88
    SUBn, G = 112, 14
    EP = 1024
    def to_lanes(a):
        a = jnp.transpose(a, (1, 2, 0))
        return jnp.pad(a, ((0, 0), (0, SUBn - N), (0, EP - E)))
    xyT = to_lanes(jnp.stack([lx, ly], 1))
    srcT = to_lanes(jnp.concatenate(
        [feats, jnp.broadcast_to(types[None, None, :], (E, 1, N)),
         still[:, None, :],
         jnp.broadcast_to(t_norm[:, None, None], (E, 1, N))], axis=1))
    kern = functools.partial(kernel_fn, n_agents=N, k=k, exact=True)
    f = jax.jit(lambda a, b: pl.pallas_call(
        kern, grid=(EP // LANE, G),
        in_specs=[
            pl.BlockSpec((2, SUBn, LANE), lambda e, g: (0, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, SUBn, LANE), lambda e, g: (0, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 8, LANE), lambda e, g: (0, g, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8, LANE), lambda e, g: (0, g, e),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, obs_rows_pad, LANE),
                               lambda e, g: (g, 0, e),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUBn, obs_rows_pad, EP),
                                       jnp.float32),
    )(a, b, a[:, : , :], b)[0, 0, :8].sum())
    # NOTE: operands (xyT, srcT, xyT-slice trick avoided: pass same)
    t0 = time.time()
    v = float(f(xyT, srcT))
    print(json.dumps({"probe": tag, "s": round(time.time() - t0, 1),
                      "val": v}), flush=True)

run("K2_static_noTail", make_variant("k2", True, True))
run("K1_static", make_variant("k1", True, False))
print("V8N_PROBE_OK", flush=True)
