"""Run-to-run spread of the gridworld training profile (fresh process),
plus a comparison of the standalone profile programs vs the actual
donated training loop's sustained iteration rate."""

import json
import sys
import time

import jax

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit(stage="start", platform=jax.devices()[0].platform)
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_gridworld import TpuTagGridWorld
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    t_envs, T_train = 2000, 100
    env = TpuTagGridWorld(num_taggers=4, grid_length=20, episode_length=100,
                          seed=7, use_full_observation=False)
    engine = EnvEngine(env_obj=env, num_envs=t_envs, seed=7)
    cfg = {
        "name": "bench_train",
        "env": {},
        "trainer": {"num_envs": t_envs,
                    "num_episodes": 4 * T_train * t_envs // 100,
                    "train_batch_size": T_train * t_envs, "seed": 1},
        "policy": {"shared": {"to_train": True, "gamma": 0.98, "lr": 0.001,
                              "model": {"type": "fully_connected",
                                        "fc_dims": [64, 64]}}},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "bench", "tag": "t"},
    }
    trainer = TrainerA2C(env_wrapper=engine, config=cfg, verbose=False)
    for i in range(5):
        prof = trainer.profile_phases(repeats=3)
        emit(stage="profile", i=i,
             steps_per_sec=round(prof["steps_per_sec"]),
             rollout_ms=round(prof["rollout_ms"], 2),
             update_ms=round(prof["update_ms"], 2),
             iteration_ms=round(prof["iteration_ms"], 2))

    # sustained donated training loop (what train() actually runs)
    import jax.numpy as jnp
    itfn = trainer._iteration_fn
    carry = trainer._carry
    t = jnp.asarray(0.0, jnp.float32)
    carry, _m = itfn(carry, t)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        carry, _m = itfn(carry, t)
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    dt = (time.perf_counter() - t0) / n
    emit(stage="sustained_donated", ms_per_iter=round(dt * 1e3, 2),
         steps_per_sec=round(T_train * t_envs / dt))
    emit(stage="done")


if __name__ == "__main__":
    main()
