"""Anatomy of the flagship update: where do 914 ms go?

At E=2000, T=100, num_mb=20 (bf16 compute) the update measures ~914 ms
= ~45 ms per minibatch, but a roofline estimate of the minibatch
forward+backward is ~15 ms. Time the pieces standalone at exact
minibatch scale (runner policy, mb=100 envs x 100 agents):

  fwd        policy forward only (logits+value sum)
  loss       forward + full A2C loss/metrics
  grad       jax.grad of loss
  gradapply  grad + optax update + apply
  scan20     lax.scan of 20 sequential gradapply steps over a stacked
             batch (the shape the trainer's update actually compiles)

Each timing draws fresh random inputs per repeat (tunnel memoization).
One JSON line per piece.
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


def timeit(fn, make_args, repeats=3, chain=None):
    """Time fn; every repeat CHAINS the previous output into the next
    input via `chain(out, args) -> args` (the tunnel replays/overlaps
    un-chained repeats: an earlier version of this probe measured a 20x
    minibatch-update scan at 0.33 ms, physically impossible), and the
    timed region ends with a host fetch of a scalar from the output."""
    args = make_args(0)
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for r in range(1, repeats + 1):
        args = make_args(r)
        if chain is not None:
            args = chain(out, args)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        # full host round-trip of a value derived from the output
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def main():
    emit(stage="start", platform=jax.devices()[0].platform)

    import optax

    from warpdrive_tpu.algos.policygradient import A2C
    from warpdrive_tpu.models.fully_connected import FullyConnected

    T, E_mb, A = 100, 100, 100
    F = 73
    heads = [11, 11]
    model = FullyConnected(fc_dims=[256, 256], output_dims=heads,
                           dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, F), jnp.float32))
    algo = A2C(discount_factor_gamma=0.98, normalize_advantage=True,
               normalize_return=True, vf_loss_coeff=1.0,
               entropy_coeff=0.05)
    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.scale_by_adam(), optax.scale(-1.0))
    opt0 = tx.init(params)

    S = T * E_mb * A

    def mk_batch(r):
        kk = jax.random.PRNGKey(100 + r)
        k1, k2, k3 = jax.random.split(kk, 3)
        obs = jax.random.normal(k1, (T, E_mb, A, F), jnp.bfloat16)
        act = jax.random.randint(k2, (T, E_mb, A, 2), 0, 11, jnp.int32)
        rew = jax.random.normal(k3, (T, E_mb, A), jnp.float32)
        done = jnp.zeros((T, E_mb), jnp.int32)
        return obs, act, rew, done

    def forward(p, obs):
        logits, value = model.apply(p, obs.reshape(S, F))
        return sum(l.sum() for l in logits) + value.sum()

    def loss_fn(p, obs, act, rew, done):
        logits, value = model.apply(p, obs.reshape(S, F))
        logits = [l.reshape(T, E_mb, A, -1) for l in logits]
        value = value.reshape(T, E_mb, A)
        loss, _ = algo.compute_loss_and_metrics(
            jnp.asarray(0.0), act, rew, done, logits, value,
            downsample_key=jax.random.PRNGKey(1))
        return loss

    def gradapply(p, opt, obs, act, rew, done):
        g = jax.grad(loss_fn)(p, obs, act, rew, done)
        upd, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, upd), opt

    j_fwd = jax.jit(forward)
    j_loss = jax.jit(loss_fn)
    j_grad = jax.jit(jax.grad(loss_fn))
    j_ga = jax.jit(gradapply)

    def chain_obs(out, args):
        # value-dependence of the next input on the previous output
        bump = jnp.asarray(out).ravel()[0].astype(args[-4].dtype) * 1e-12
        return args[:-4] + (args[-4] + bump,) + args[-3:]

    emit(piece="fwd", ms=round(timeit(
        j_fwd, lambda r: (params, mk_batch(r)[0]),
        chain=lambda out, args: (
            args[0], args[1] + out.astype(args[1].dtype) * 1e-12)), 2))
    emit(piece="loss", ms=round(timeit(
        j_loss, lambda r: (params,) + mk_batch(r), chain=chain_obs), 2))
    emit(piece="grad", ms=round(timeit(
        j_grad,
        lambda r: (params,) + mk_batch(r),
        chain=lambda out, args: (
            jax.tree_util.tree_map(lambda p, g: p + 1e-12 * g,
                                   args[0], out),
        ) + args[1:]), 2))
    emit(piece="gradapply", ms=round(timeit(
        j_ga, lambda r: (params, opt0) + mk_batch(r),
        chain=lambda out, args: (out[0], out[1]) + args[2:]), 2))

    # the scan the trainer compiles: 20 sequential minibatch updates over
    # a stacked (T, E=2000) batch, sliced contiguously per step
    NMB = 20

    def scan20(p, opt, obs, act, rew, done):
        def step(c, off):
            p, opt = c
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, off, E_mb, axis=1)
            p, opt = gradapply(p, opt, sl(obs), sl(act), sl(rew), sl(done))
            return (p, opt), 0.0

        offs = jnp.arange(NMB, dtype=jnp.int32) * E_mb
        (p, opt), _ = jax.lax.scan(step, (p, opt), offs)
        return p, opt

    def mk_full(r):
        kk = jax.random.PRNGKey(200 + r)
        k1, k2, k3 = jax.random.split(kk, 3)
        E = E_mb * NMB
        obs = jax.random.normal(k1, (T, E, A, F), jnp.bfloat16)
        act = jax.random.randint(k2, (T, E, A, 2), 0, 11, jnp.int32)
        rew = jax.random.normal(k3, (T, E, A), jnp.float32)
        done = jnp.zeros((T, E), jnp.int32)
        return obs, act, rew, done

    j_scan = jax.jit(scan20)
    emit(piece="scan20", ms=round(timeit(
        j_scan, lambda r: (params, opt0) + mk_full(r),
        chain=lambda out, args: (out[0], out[1]) + args[2:]), 2))

    emit(stage="done")


if __name__ == "__main__":
    main()
