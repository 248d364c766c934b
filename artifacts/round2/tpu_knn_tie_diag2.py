"""Tie diagnosis on a REAL rolled flagship state (lattice-like positions).

Counts exact d2 ties, then compares all selection algorithms from one
shared d2 inside one program, plus numpy ground truth per algorithm.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from artifacts.round2.tpu_knn_tie_diag import (  # noqa: E402
    _BIG, make_d2, sel_ladder, sel_packed, sel_passes, sel_topk,
)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit(stage="start", platform=jax.devices()[0].platform)
    from warpdrive_tpu.presets import build_flagship

    s = build_flagship(num_envs=64, seed=0)
    eng = s["engine"]
    heads = [int(n) for n in eng.env.action_space[0].nvec]

    def roll(state, key):
        def body(st, k):
            k_act, k_reset = jax.random.split(k)
            actions = jax.random.randint(
                k_act, (64, eng.n_agents, len(heads)),
                jnp.zeros((len(heads),), jnp.int32),
                jnp.asarray(heads, jnp.int32), dtype=jnp.int32)
            st = eng.step_physics(st, actions)
            return eng.auto_reset(st, k_reset), None
        return jax.lax.scan(body, state, jax.random.split(key, 37))[0]

    state = jax.device_get(jax.jit(roll)(s["state"], jax.random.PRNGKey(11)))
    lx = state["loc_x"]
    ly = state["loc_y"]
    alive = state["still_in_the_game"] > 0
    E, N = lx.shape
    k = 10

    # host-side tie census on the masked d2
    dx = lx[:, :, None] - lx[:, None, :]
    dy = ly[:, :, None] - ly[:, None, :]
    d2h = dx * dx + dy * dy
    eye = np.eye(N, dtype=bool)[None]
    d2h = np.where(eye | (~alive)[:, None, :], _BIG, d2h)
    # per-row: does any candidate value occur more than once (below BIG)?
    rows_with_tie = 0
    total_dup_pairs = 0
    for e in range(E):
        for i in range(N):
            row = d2h[e, i][d2h[e, i] < _BIG]
            u, c = np.unique(row, return_counts=True)
            d = int(np.sum(c > 1))
            if d:
                rows_with_tie += 1
                total_dup_pairs += int(np.sum(c[c > 1] - 1))
    emit(stage="tie_census", rows_with_tie=rows_with_tie,
         total_rows=E * N, dup_pairs=total_dup_pairs)

    @jax.jit
    def e1(lx, ly, alive):
        d2 = jax.vmap(make_d2)(lx, ly, alive)
        outs = {}
        for name, fn in [("passes", sel_passes), ("ladder", sel_ladder),
                         ("packed", sel_packed), ("topk", sel_topk)]:
            outs[name] = jax.vmap(lambda d: fn(d, k))(d2)
        return d2, outs

    d2_dev, outs = jax.device_get(e1(jnp.asarray(lx), jnp.asarray(ly),
                                     jnp.asarray(alive)))
    emit(stage="d2_dev_vs_host_equal",
         equal=bool(np.array_equal(d2_dev, d2h.astype(np.float32))),
         n_diff=int(np.sum(d2_dev != d2h.astype(np.float32))))

    # numpy ground truth (k-round argmin, lowest-index ties)
    am_np = np.zeros((E, N, k), np.int64)
    v_np = np.zeros((E, N, k), bool)
    d2w = d2_dev.copy()
    for sl in range(k):
        am_np[:, :, sl] = np.argmin(d2w, axis=2)
        v_np[:, :, sl] = np.min(d2w, axis=2) < _BIG
        np.put_along_axis(d2w, am_np[:, :, sl][:, :, None], _BIG, axis=2)

    for name in ("passes", "ladder", "packed", "topk"):
        am, v = outs[name]
        mism = int(np.sum((am != am_np) & v_np))
        vmism = int(np.sum(v != v_np))
        emit(stage="vs_numpy", algo=name, slot_mismatches=mism,
             valid_mismatches=vmism, total_slots=int(v_np.size))

    emit(stage="done")


if __name__ == "__main__":
    main()
