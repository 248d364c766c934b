"""
``trainer.update_recompute_obs``: the rollout records the compact physical
state and the update re-derives observations inside the loss forward
(docs/performance.md §3 extended to the training batch; redesigns reference
``trainer_a2c.py:218-259``, whose whole-batch forward reads a stored obs
tensor).  The recompute path must produce the same training trajectory as
the store-obs path (identical obs values up to reduction-order rounding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warpdrive_tpu.envs.engine import EnvEngine
from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
from warpdrive_tpu.training.trainer_a2c import TrainerA2C

ENV_KW = dict(
    num_taggers=2,
    num_runners=8,
    grid_length=10.0,
    episode_length=20,
    num_other_agents_observed=4,
    use_full_observation=False,
    seed=11,
)


def _make_trainer(recompute, num_envs=8, **policy_extra):
    env = TpuTagContinuous(**ENV_KW)
    engine = EnvEngine(env_obj=env, num_envs=num_envs, seed=5)
    pmap = {
        "tagger": [i for i in range(env.num_agents) if env.agent_type[i] == 1],
        "runner": [i for i in range(env.num_agents) if env.agent_type[i] == 0],
    }
    pol = dict(
        {
            "to_train": True,
            "algorithm": "A2C",
            "gamma": 0.98,
            "lr": 0.01,
            "model": {"type": "fully_connected", "fc_dims": [16, 16]},
        },
        **policy_extra,
    )
    cfg = {
        "name": "recompute_test",
        "env": {},
        "trainer": {
            "num_envs": num_envs,
            "num_episodes": 8 * num_envs,
            "train_batch_size": 20 * num_envs,
            "seed": 17,
            "update_recompute_obs": recompute,
        },
        "policy": {"runner": dict(pol), "tagger": dict(pol)},
        "saving": {
            "metrics_log_freq": 10**9,
            "model_params_save_freq": 10**9,
            "basedir": "/tmp",
            "name": "rc",
            "tag": "t",
        },
    }
    return TrainerA2C(
        env_wrapper=engine, config=cfg, policy_tag_to_agent_id_map=pmap,
        verbose=False,
    )


def _params_after(trainer, iters=3):
    carry = trainer._carry
    fn = trainer._iteration_fn_fast
    for i in range(iters):
        carry, _ = fn(carry, jnp.asarray(float(i), jnp.float32))
    return jax.tree_util.tree_map(np.asarray, carry["params"])


def test_recompute_matches_store():
    p_store = _params_after(_make_trainer(False))
    p_rec = _params_after(_make_trainer(True))
    flat_s = jax.tree_util.tree_leaves(p_store)
    flat_r = jax.tree_util.tree_leaves(p_rec)
    assert len(flat_s) == len(flat_r) > 0
    for a, b in zip(flat_s, flat_r):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_recompute_batch_has_no_obs():
    tr = _make_trainer(True)
    assert tr._recompute_obs
    rollout = tr._make_rollout()
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    carry = tr._carry
    (_, batch) = jax.jit(rollout)(
        carry["params"],
        (carry["env_state"], carry["ep_acc"], carry["ep_sum"],
         carry["ep_count"]),
        keys,
    )
    assert "phys" in batch
    assert not any(k.startswith("obs_") for k in batch)
    # the stored physical state is ~9x smaller than the obs batch it
    # replaces (the whole point)
    phys_bytes = sum(
        np.prod(v.shape) * v.dtype.itemsize
        for v in jax.tree_util.tree_leaves(batch["phys"])
    )
    env = tr.engine.env
    obs_bytes = (
        4 * tr.num_envs * tr.engine.n_agents * env.obs_size
    )  # per step, f32
    assert phys_bytes / 4 < obs_bytes  # 4 recorded steps vs 1 step of obs


@pytest.mark.parametrize("shuffle", [False, True])
def test_recompute_minibatched_matches(shuffle):
    kw = dict(num_minibatches=2, shuffle_minibatches=shuffle)
    p_store = _params_after(_make_trainer(False, **kw))
    p_rec = _params_after(_make_trainer(True, **kw))
    for a, b in zip(
        jax.tree_util.tree_leaves(p_store), jax.tree_util.tree_leaves(p_rec)
    ):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_recompute_ppo_multi_epoch():
    kw = dict(algorithm="PPO", num_epochs=2, num_minibatches=2)
    p_store = _params_after(_make_trainer(False, **kw))
    p_rec = _params_after(_make_trainer(True, **kw))
    for a, b in zip(
        jax.tree_util.tree_leaves(p_store), jax.tree_util.tree_leaves(p_rec)
    ):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_recompute_sharded_matches_unsharded():
    from warpdrive_tpu.parallel.mesh import apply_env_sharding

    p_ref = _params_after(_make_trainer(True))

    env = TpuTagContinuous(**ENV_KW)
    engine = EnvEngine(env_obj=env, num_envs=8, seed=5)
    apply_env_sharding(engine, 4)
    pmap = {
        "tagger": [i for i in range(env.num_agents) if env.agent_type[i] == 1],
        "runner": [i for i in range(env.num_agents) if env.agent_type[i] == 0],
    }
    pol = dict(
        to_train=True, algorithm="A2C", gamma=0.98, lr=0.01,
        model={"type": "fully_connected", "fc_dims": [16, 16]},
    )
    cfg = {
        "name": "recompute_mesh",
        "env": {},
        "trainer": {
            "num_envs": 8,
            "num_episodes": 64,
            "train_batch_size": 160,
            "seed": 17,
            "update_recompute_obs": True,
        },
        "policy": {"runner": dict(pol), "tagger": dict(pol)},
        "saving": {
            "metrics_log_freq": 10**9,
            "model_params_save_freq": 10**9,
            "basedir": "/tmp",
            "name": "rcm",
            "tag": "t",
        },
    }
    tr = TrainerA2C(
        env_wrapper=engine, config=cfg, policy_tag_to_agent_id_map=pmap,
        verbose=False,
    )
    p_mesh = _params_after(tr)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_mesh)
    ):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
