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


# The child script runs the REAL v8 envlanes kernel (tiny shapes) in
# compiled mode and bit-compares it against its own interpret-mode
# output.  An earlier draft probed a GENERIC (8, 16, 128) middle-axis
# reduction instead — and accidental TPU executions of it PASSED while
# the actual v8 kernel wedges: the wedge class is narrower than "any
# sublane reduction with a leading dim" (knn_obs.py's own v9 n_valid
# count is one too, and runs fine).  Only the kernel itself is an
# honest capability probe.  The value FETCH is the execution proof
# (CLAUDE.md rule 7): on a wedged toolchain the fetch hangs and the
# parent's timeout kills the child.  WD_PROBE_INTERPRET=1 makes the
# "compiled" call interpret too (the CPU bit-rot test: compiled-mode
# pallas_call is unsupported on the CPU backend).
_CHILD = r"""
import os
import numpy as np
import jax, jax.numpy as jnp
from warpdrive_tpu.ops.knn_obs import _knn_observation_envlanes

interp = os.environ.get("WD_PROBE_INTERPRET") == "1"
rng = np.random.RandomState(0)
E, N, k = 4, 12, 3
args = (
    jnp.asarray(rng.rand(E, N), jnp.float32),
    jnp.asarray(rng.rand(E, N), jnp.float32),
    jnp.asarray(rng.rand(E, 5, N), jnp.float32),
    jnp.asarray(rng.randint(0, 2, N), jnp.float32),
    jnp.ones((E, N), jnp.float32),
    jnp.zeros((E,), jnp.float32),
)
kw = dict(n_agents=N, k=k, variant="envlanes_exact", raw_out=False)
ref = np.asarray(_knn_observation_envlanes(*args, interpret=True, **kw))
out = np.asarray(
    _knn_observation_envlanes(*args, interpret=interp, **kw)
)  # the host fetch is the realization proof
assert np.array_equal(out, ref), "envlanes kernel output mismatch"
print("ENVLANES_PROBE_OK", flush=True)
"""


def _repo_pythonpath(env: dict) -> dict:
    """Make sure the child can import warpdrive_tpu (running `python -c`
    puts the child's CWD, not the repo root, on sys.path)."""
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    parts = [repo_root] + [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and p != repo_root
    ]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    return env


def probe(timeout: float = 300.0, force: bool = False,
          env: dict | None = None) -> bool:
    """Run the wedge-class probe in a subprocess (requires the chip to be
    FREE — do not call while another process holds the TPU claim).
    Returns the verdict and caches it for :func:`cached_verdict`.

    ``env`` overrides the child's environment.  Callers that want a
    CPU-only probe (tests) must pass :func:`cpu_child_env`: the TPU
    deployment's sitecustomize imports jax at interpreter start and can
    BLOCK the child on the device claim before JAX_PLATFORMS is even
    consulted (observed during the round-5 claim wedge)."""
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
            env=_repo_pythonpath(dict(env if env is not None
                                      else os.environ)),
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


def cpu_child_env() -> dict:
    """A child environment that really runs on CPU: JAX_PLATFORMS=cpu
    AND the TPU-plugin sitecustomize stripped from PYTHONPATH (it
    imports jax at interpreter start and can block on the device
    claim regardless of JAX_PLATFORMS)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["WD_PROBE_INTERPRET"] = "1"  # compiled pallas is TPU-only
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


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
