"""Does keeping the loss/metric VALUES double the update cost?

Same runner-update scan, four gradient forms:
  grad          jax.grad, no aux                       (anatomy6: 394 ms)
  valgrad       jax.value_and_grad, keep loss scalar
  aux_loss      has_aux full metrics, keep Total loss
  aux_full      has_aux full metrics, keep whole dict (trainer's form)
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
        "name": "anat7",
        "env": {},
        "trainer": {"num_envs": n_envs, "num_episodes": 4 * n_envs,
                    "train_batch_size": T * n_envs, "seed": 1,
                    "batch_dtype": "bfloat16"},
        "policy": {"runner": dict(pol, lr=0.005), "tagger": dict(pol)},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "anat7", "tag": "t"},
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

    algo = tr.algorithms["runner"]
    model = tr.models["runner"]
    tx = tr.optimizers["runner"]
    E_mb, NMB, A = 100, 20, 100
    F = batch["obs_runner"].shape[-1]
    S = T * E_mb * A

    def loss_and_metrics(p, obs, act, rew, done):
        logits, value = model.apply(p, obs.reshape(S, F))
        logits = [l.reshape(T, E_mb, A, -1) for l in logits]
        value = value.reshape(T, E_mb, A)
        return algo.compute_loss_and_metrics(
            jnp.asarray(0.0), act, rew, done, logits, value,
            downsample_key=jax.random.PRNGKey(1))

    def loss_only(p, *d):
        return loss_and_metrics(p, *d)[0]

    def mk_scan(gradform):
        def scan(p, opt, obs, act, rew, done):
            def step(c, off):
                p, opt = c
                sl = lambda x: jax.lax.dynamic_slice_in_dim(
                    x, off, E_mb, axis=1)
                d = (sl(obs), sl(act), sl(rew), sl(done))
                if gradform == "grad":
                    g = jax.grad(loss_only)(p, *d)
                    ys = jnp.zeros(())
                elif gradform == "valgrad":
                    val, g = jax.value_and_grad(loss_only)(p, *d)
                    ys = val
                elif gradform == "aux_loss":
                    g, m = jax.grad(
                        lambda p_, *d_: loss_and_metrics(p_, *d_),
                        has_aux=True)(p, *d)
                    ys = m["Total loss"]
                else:  # aux_full
                    g, m = jax.grad(
                        lambda p_, *d_: loss_and_metrics(p_, *d_),
                        has_aux=True)(p, *d)
                    ys = m
                upd_, opt = tx.update(g, opt, p)
                upd_ = jax.tree_util.tree_map(lambda u: u * 0.005, upd_)
                p = optax.apply_updates(p, upd_)
                return (p, opt), ys

            offs = jnp.arange(NMB, dtype=jnp.int32) * E_mb
            (p, opt), ys = jax.lax.scan(step, (p, opt), offs)
            return p, opt, ys

        return scan

    data = (batch["obs_runner"], batch["actions_runner"],
            batch["rewards_runner"], batch["done"])

    def timeit(fn, label, repeats=3):
        j = jax.jit(fn)
        out = j(carry["params"]["runner"], carry["opt"]["runner"], *data)
        jax.block_until_ready(out)
        best = float("inf")
        for r in range(repeats):
            p2, o2 = out[0], out[1]
            jax.block_until_ready((p2, o2))
            t0 = time.perf_counter()
            out = j(p2, o2, *data)
            float(np.asarray(jax.tree_util.tree_leaves(out[0])[0]
                             ).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        emit(piece=label, ms=round(best * 1000, 2))

    for form in ("grad", "valgrad", "aux_loss", "aux_full"):
        timeit(mk_scan(form), form)

    emit(stage="done")


if __name__ == "__main__":
    main()
