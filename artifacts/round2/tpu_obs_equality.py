"""Direct TPU oracle: observations computed from IDENTICAL states must agree
across kNN algorithms (the trajectory-level check is chaotic — a 1-ulp
physics rounding difference from different XLA fusions flips tagging
branches).  Runs a 'passes' rollout to produce a batch of mid-episode
states, then evaluates every algorithm's observe on those same states.
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
    devs = jax.devices()
    emit(stage="start", platform=devs[0].platform)
    from warpdrive_tpu.presets import build_flagship

    s = build_flagship(num_envs=64, seed=0)
    eng = s["engine"]

    # roll 37 steps with random actions to get a non-trivial state
    # (some runners tagged, varied positions)
    def roll(state, key):
        def body(c, k):
            st = c
            k_act, k_reset = jax.random.split(k)
            heads = [int(n) for n in eng.env.action_space[0].nvec]
            actions = jax.random.randint(
                k_act, (64, eng.n_agents, len(heads)),
                jnp.zeros((len(heads),), jnp.int32),
                jnp.asarray(heads, jnp.int32), dtype=jnp.int32)
            st = eng.step_physics(st, actions)
            return eng.auto_reset(st, k_reset), None
        return jax.lax.scan(body, state, jax.random.split(key, 37))[0]

    state = jax.jit(roll)(s["state"], jax.random.PRNGKey(11))
    state = jax.tree_util.tree_map(lambda x: np.asarray(x), state)
    emit(stage="state_ready",
         tagged=int(64 * eng.n_agents - state["still_in_the_game"].sum()))

    outs = {}
    for algo, select in [("passes", "fused"), ("ladder", "fused"),
                         ("packed", "fused"), ("packed", "gather"),
                         ("topk", "fused"), ("topk", "gather")]:
        sb = build_flagship(num_envs=64, seed=0, knn_algorithm=algo,
                            knn_select=select)
        st = {k: jnp.asarray(v) for k, v in state.items()}
        obs = np.asarray(jax.jit(sb["engine"].observe)(st))
        outs[(algo, select)] = obs
        if algo == "passes":
            emit(stage="obs", algo=algo, select=select, ref=True)
            continue
        ref = outs[("passes", "fused")]
        exact = bool(np.array_equal(obs, ref))
        close = bool(np.allclose(obs, ref, rtol=1e-5, atol=1e-6))
        max_abs = float(np.max(np.abs(obs - ref)))
        frac_diff = float(np.mean(~np.isclose(obs, ref, rtol=1e-5,
                                              atol=1e-6)))
        emit(stage="obs", algo=algo, select=select, exact=exact,
             allclose=close, max_abs_diff=round(max_abs, 8),
             frac_entries_diff=round(frac_diff, 8))

    emit(stage="done")


if __name__ == "__main__":
    main()
