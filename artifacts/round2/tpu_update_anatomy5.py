"""Why is the trainer's runner update 948 ms vs a 376 ms reconstruction?

Compare XLA cost analyses (flops / bytes accessed) of the two compiled
programs, then close in: the reconstruction that reshapes obs to 2-D
before model.apply vs the trainer's 4-D apply, and a trainer variant
timed with the obs pre-flattened.
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


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {k: round(float(v), 3) for k, v in ca.items()
            if k in ("flops", "bytes accessed", "optimal_seconds",
                     "bytes accessed output", "transcendentals")}


def main():
    emit(stage="start", platform=jax.devices()[0].platform)

    import optax

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
        "name": "anat5",
        "env": {},
        "trainer": {"num_envs": n_envs, "num_episodes": 4 * n_envs,
                    "train_batch_size": T * n_envs, "seed": 1,
                    "batch_dtype": "bfloat16"},
        "policy": {"runner": dict(pol, lr=0.005), "tagger": dict(pol)},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "anat5", "tag": "t"},
    }
    tr = TrainerA2C(env_wrapper=engine, config=cfg,
                    policy_tag_to_agent_id_map=pmap, verbose=False)

    rollout = jax.jit(tr._make_rollout())
    carry = jax.tree_util.tree_map(jnp.copy, tr._carry)
    keys = jax.random.split(jax.random.PRNGKey(7), T)
    _, batch = rollout(
        carry["params"],
        (carry["env_state"], carry["ep_acc"], carry["ep_sum"],
         carry["ep_count"]),
        keys,
    )
    jax.block_until_ready(batch)
    emit(stage="batch_ready")

    tr.policies_to_train = ["runner"]
    upd = tr._make_update()
    args_upd = (carry["params"], carry["opt"], batch,
                jnp.asarray(0.0, jnp.float32), jax.random.PRNGKey(3))
    emit(piece="trainer_runner_update_cost", **cost(upd, *args_upd))

    # reconstruction: same loss/optimizer via the trainer's own pieces,
    # but obs flattened to 2-D before apply
    algo = tr.algorithms["runner"]
    model = tr.models["runner"]
    tx = tr.optimizers["runner"]
    E_mb, NMB, A = 100, 20, 100
    F = batch["obs_runner"].shape[-1]
    S = T * E_mb * A

    def loss2d(p, obs, act, rew, done):
        logits, value = model.apply(p, obs.reshape(S, F))
        logits = [l.reshape(T, E_mb, A, -1) for l in logits]
        value = value.reshape(T, E_mb, A)
        loss, m = algo.compute_loss_and_metrics(
            jnp.asarray(0.0), act, rew, done, logits, value,
            downsample_key=jax.random.PRNGKey(1))
        return loss, m

    def loss4d(p, obs, act, rew, done):
        logits, value = model.apply(p, obs)
        loss, m = algo.compute_loss_and_metrics(
            jnp.asarray(0.0), act, rew, done, logits, value,
            downsample_key=jax.random.PRNGKey(1))
        return loss, m

    def mk_scan(loss_fn):
        def scan(p, opt, obs, act, rew, done):
            def step(c, off):
                p, opt = c
                sl = lambda x: jax.lax.dynamic_slice_in_dim(
                    x, off, E_mb, axis=1)
                g, m = jax.grad(loss_fn, has_aux=True)(
                    p, sl(obs), sl(act), sl(rew), sl(done))
                upd_, opt = tx.update(g, opt, p)
                upd_ = jax.tree_util.tree_map(lambda u: u * 0.005, upd_)
                p = optax.apply_updates(p, upd_)
                return (p, opt), m["Total loss"]

            offs = jnp.arange(NMB, dtype=jnp.int32) * E_mb
            (p, opt), ys = jax.lax.scan(step, (p, opt), offs)
            return p, opt, ys

        return scan

    args_rec = (carry["params"]["runner"], carry["opt"]["runner"],
                batch["obs_runner"], batch["actions_runner"],
                batch["rewards_runner"], batch["done"])
    emit(piece="recon2d_cost", **cost(mk_scan(loss2d), *args_rec))
    emit(piece="recon4d_cost", **cost(mk_scan(loss4d), *args_rec))

    # and time both reconstructions (chained)
    def timeit(fn, label, repeats=3):
        j = jax.jit(fn)
        out = j(*args_rec)
        jax.block_until_ready(out)
        best = float("inf")
        for r in range(repeats):
            p2, o2, _ = out
            jax.block_until_ready((p2, o2))
            t0 = time.perf_counter()
            out = j(p2, o2, *args_rec[2:])
            float(np.asarray(jax.tree_util.tree_leaves(out[0])[0]
                             ).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        emit(piece=label, ms=round(best * 1000, 2))

    timeit(mk_scan(loss2d), "recon2d_ms")
    timeit(mk_scan(loss4d), "recon4d_ms")

    emit(stage="done")


if __name__ == "__main__":
    main()
