"""Localize the obs entry differences between passes and ladder on TPU.

Same rolled state as tpu_obs_equality; compares engine.observe outputs from
separately-jitted programs, then reports WHERE they differ (env, agent,
slot, entry-kind, agent alive?) and cross-checks the neighbor indices of
the differing rows against numpy.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


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

    obs = {}
    for algo in ("passes", "ladder"):
        sb = build_flagship(num_envs=64, seed=0, knn_algorithm=algo)
        st = {k: jnp.asarray(v) for k, v in state.items()}
        obs[algo] = np.asarray(jax.jit(sb["engine"].observe)(st))

    a, b = obs["passes"], obs["ladder"]
    emit(stage="shape", shape=list(a.shape))
    diff = ~np.isclose(a, b, rtol=1e-5, atol=1e-6)
    n = int(diff.sum())
    emit(stage="total_diff_entries", n=n, frac=round(float(diff.mean()), 6))
    if n:
        envs, agents, entries = np.nonzero(diff)
        alive = state["still_in_the_game"]
        k = 10
        # entry layout: slot-major (k slots x 8) + 1 time entry
        slot = entries // 8
        within = entries % 8
        emit(stage="diff_breakdown",
             n_rows=int(len(set(zip(envs.tolist(), agents.tolist())))),
             alive_rows=int(sum(alive[e, i] > 0 for e, i in
                                set(zip(envs.tolist(), agents.tolist())))),
             time_entries=int(np.sum(entries == 8 * k)),
             slot_hist=np.bincount(np.minimum(slot, k), minlength=k + 1
                                   ).tolist(),
             within_hist=np.bincount(within, minlength=8).tolist())
        # examine the first few differing rows in detail
        seen = set()
        for e, i in zip(envs.tolist(), agents.tolist()):
            if (e, i) in seen or len(seen) >= 3:
                continue
            seen.add((e, i))
            lx, ly = state["loc_x"][e], state["loc_y"][e]
            al = alive[e] > 0
            dx = lx[i] - lx
            dy = ly[i] - ly
            d2 = dx * dx + dy * dy
            d2 = np.where(~al, 1e20, d2)
            d2[i] = 1e20
            order = np.argsort(d2, kind="stable")[:12]
            emit(stage="row_detail", env=e, agent=i, alive=bool(al[i]),
                 nearest=[(int(j), float(d2[j])) for j in order],
                 obs_a=[round(float(x), 5) for x in a[e, i][:24]],
                 obs_b=[round(float(x), 5) for x in b[e, i][:24]])
    emit(stage="done")


if __name__ == "__main__":
    main()
