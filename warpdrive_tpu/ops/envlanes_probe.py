"""
Toolchain capability probe for the v8 "envs-on-lanes" kernel class.

Round 4 found a Mosaic codegen wedge (bisected in
``artifacts/round4/r4_envlanes_wedge.md``): a Pallas TPU kernel whose body
performs 3-D MIDDLE-AXIS (sublane) reductions with a non-trivial leading
block dimension compiles, "runs", and reports its output buffer ready —
but the buffer is poisoned, and the first on-device consumer or host fetch
wedges the chip until the client is killed.  The v8 kernels
(``ops/knn_obs.py:_knn_obs_kernel_v8``) are exactly that class, so they are
fenced off on TPU.

This module turns the unconditional fence into a VERSIONED capability
probe (VERDICT r4 next #8): a tiny kernel of the same reduction class is
run once per toolchain version in a SUBPROCESS with a hard timeout, and
the verdict is cached on disk.  A future Mosaic release that fixes the
wedge class unfences the envlanes layout automatically — rerun the probe
after a toolchain upgrade:

    python -m warpdrive_tpu.ops.envlanes_probe

The probe is NEVER run implicitly from ``knn_observation``: the TPU chip
is single-tenant (CLAUDE.md rule 1), so a probe subprocess launched while
the calling process holds the chip would deadlock on the device claim.
The fence only *reads* the cached verdict.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CACHE_ENV = "WD_ENVLANES_PROBE_CACHE"
_DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "warpdrive_tpu"
)


def toolchain_key() -> str:
    """Version key the probe verdict is cached under: the wedge is a
    property of the Mosaic compiler + TPU runtime shipped with
    jax/jaxlib/libtpu, so those three versions identify the toolchain."""
    import jax
    import jaxlib

    try:
        import libtpu

        lt = getattr(libtpu, "__version__", "unknown")
    except ImportError:  # CPU-only install
        lt = "none"
    return f"jax{jax.__version__}-jaxlib{jaxlib.__version__}-libtpu{lt}"


def _cache_path() -> str:
    d = os.environ.get(_CACHE_ENV, _DEFAULT_CACHE_DIR)
    return os.path.join(d, "envlanes_probe.json")


def cached_verdict(key: str | None = None) -> bool | None:
    """Cached probe verdict for this toolchain: True (runnable), False
    (wedge class present), or None (never probed)."""
    key = key or toolchain_key()
    try:
        with open(_cache_path()) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return None
    entry = data.get(key)
    if isinstance(entry, dict) and isinstance(entry.get("ok"), bool):
        return entry["ok"]
    return None


def _write_verdict(key: str, ok: bool, detail: str) -> None:
    path = _cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        data = {}
    data[key] = {"ok": ok, "detail": detail}
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)


# The child script: a minimal kernel of the wedge class — a (8, SUB, LANE)
# block whose body reduces over the MIDDLE (sublane) axis with a
# non-trivial leading dim, exactly the reduction shape the r4 bisection
# isolated (r4_envlanes_wedge.md probes v8a..n).  The value FETCH is the
# execution proof (CLAUDE.md rule 7): on a wedged toolchain the fetch
# hangs and the parent's timeout kills us.
_CHILD = r"""
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(x_ref, o_ref):
    x = x_ref[:]                      # (8, 16, 128)
    s = jnp.sum(x, axis=1, keepdims=True)   # middle-axis (sublane) reduce
    m = jnp.min(x, axis=1, keepdims=True)
    o_ref[:] = jnp.broadcast_to(s + m, o_ref.shape)

x = jnp.asarray(np.random.RandomState(0).rand(8, 16, 128), jnp.float32)
out = pl.pallas_call(
    kernel,
    in_specs=[pl.BlockSpec((8, 16, 128), lambda: (0, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((8, 16, 128), lambda: (0, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 16, 128), jnp.float32),
)(x)
got = np.asarray(out)                  # host fetch = realization proof
want = (np.asarray(x).sum(1, keepdims=True)
        + np.asarray(x).min(1, keepdims=True))
assert np.allclose(got, np.broadcast_to(want, got.shape), atol=1e-4), \
    "probe kernel produced wrong values"
print("ENVLANES_PROBE_OK", flush=True)
"""


def probe(timeout: float = 300.0, force: bool = False) -> bool:
    """Run the wedge-class probe in a subprocess (requires the chip to be
    FREE — do not call while another process holds the TPU claim).
    Returns the verdict and caches it for :func:`cached_verdict`."""
    key = toolchain_key()
    if not force:
        hit = cached_verdict(key)
        if hit is not None:
            return hit
    try:
        res = subprocess.run(
            [sys.executable, "-c", _CHILD],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
        ok = res.returncode == 0 and "ENVLANES_PROBE_OK" in res.stdout
        detail = (
            "probe kernel ran and verified"
            if ok
            else f"rc={res.returncode} stderr_tail={res.stderr[-400:]!r}"
        )
    except subprocess.TimeoutExpired:
        ok = False
        detail = (
            f"probe timed out after {timeout}s — the wedge class "
            "(poisoned output buffer, hang on first consumption) is "
            "present on this toolchain; see "
            "artifacts/round4/r4_envlanes_wedge.md"
        )
    _write_verdict(key, ok, detail)
    return ok


def main() -> None:
    key = toolchain_key()
    print(f"[envlanes-probe] toolchain: {key}")
    prior = cached_verdict(key)
    if prior is not None:
        print(f"[envlanes-probe] cached verdict: {'OK' if prior else 'WEDGED'}"
              " (use --force to re-run)")
        if "--force" not in sys.argv:
            return
    ok = probe(force=True)
    print(f"[envlanes-probe] verdict: {'OK — envlanes kernels unfenced' if ok else 'WEDGED — envlanes kernels stay fenced to interpret mode'}")


if __name__ == "__main__":
    main()
