"""Trainer-update anatomy: direct timing of the real update program.

The standalone reconstruction (tpu_update_anatomy2.log) costs 376 ms for
the runner-policy minibatch scan, but profile_phases attributes 914 ms
to the update (iteration - rollout). Time the trainer's OWN update
jittable directly on a real rollout batch, plus a metrics-stripped
variant, to locate the remaining ~490 ms. Chained repeats throughout.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit(stage="start", platform=jax.devices()[0].platform)

    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
    from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    T, n_envs = 100, 2000
    env = TpuTagContinuous(
        **dict(FLAGSHIP_ENV_KWARGS, seed=274880, knn_algorithm="packed")
    )
    engine = EnvEngine(env_obj=env, num_envs=n_envs, seed=31)
    pmap = {
        "tagger": [i for i in range(env.num_agents)
                   if env.agent_type[i] == 1],
        "runner": [i for i in range(env.num_agents)
                   if env.agent_type[i] == 0],
    }
    pol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
           "entropy_coeff": 0.05, "clip_grad_norm": True,
           "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
           "remat": False, "num_minibatches": 20,
           "shuffle_minibatches": False,
           "model": {"type": "fully_connected", "fc_dims": [256, 256],
                     "dtype": "bfloat16"}}
    cfg = {
        "name": "anat3",
        "env": {},
        "trainer": {"num_envs": n_envs, "num_episodes": 4 * n_envs,
                    "train_batch_size": T * n_envs, "seed": 1,
                    "batch_dtype": "bfloat16"},
        "policy": {"runner": dict(pol, lr=0.005), "tagger": dict(pol)},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "anat3", "tag": "t"},
    }
    tr = TrainerA2C(env_wrapper=engine, config=cfg,
                    policy_tag_to_agent_id_map=pmap, verbose=False)

    # one real rollout batch
    rollout = jax.jit(tr._make_rollout())
    carry = jax.tree_util.tree_map(jnp.copy, tr._carry)
    keys = jax.random.split(jax.random.PRNGKey(7), T)
    (env_state, ep_acc, ep_sum, ep_count), batch = rollout(
        carry["params"],
        (carry["env_state"], carry["ep_acc"], carry["ep_sum"],
         carry["ep_count"]),
        keys,
    )
    jax.block_until_ready(batch)
    emit(stage="batch_ready",
         keys=sorted([(k, str(v.dtype), list(v.shape))
                      for k, v in batch.items()]))

    def timeit(fn, params0, opt0, label, repeats=3):
        p, o = params0, opt0
        out = fn(p, o, batch, jnp.asarray(0.0, jnp.float32),
                 jax.random.PRNGKey(3))
        jax.block_until_ready(out)
        best = float("inf")
        for r in range(repeats):
            p2, o2, m = out
            jax.block_until_ready((p2, o2))
            t0 = time.perf_counter()
            out = fn(p2, o2, batch, jnp.asarray(float(r), jnp.float32),
                     jax.random.PRNGKey(3 + r))
            float(np.asarray(jax.tree_util.tree_leaves(out[0])[0]
                             ).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        emit(piece=label, ms=round(best * 1000, 2))

    upd = jax.jit(tr._make_update())
    timeit(upd, carry["params"], carry["opt"], "trainer_update")

    # metrics-stripped variant: empty metrics dict -> XLA DCEs the
    # metric reductions; isolates their cost
    import warpdrive_tpu.algos.policygradient as pg

    orig = pg.A2C.compute_loss_and_metrics

    def lean(self, *a, **kw):
        loss, _ = orig(self, *a, **kw)
        return loss, {"Total loss": loss}

    pg.A2C.compute_loss_and_metrics = lean
    try:
        upd2 = jax.jit(tr._make_update())
        timeit(upd2, carry["params"], carry["opt"],
               "trainer_update_no_metrics")
    finally:
        pg.A2C.compute_loss_and_metrics = orig

    emit(stage="done")


if __name__ == "__main__":
    main()
