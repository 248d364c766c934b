"""Reference-scale TagContinuous adversarial training ON THE TPU CHIP —
round 3: ORACLE-EXACT observations (pallas_mxu_exact kernel), seeded for
a variance band (VERDICT r3 item 7).

The reference's flagship benchmark setup (README.md:53-55: 5 taggers +
100 runners, tag_continuous.yaml semantics) trained end-to-end on-device:
fused rollout (packed-kNN observations) + two-policy A2C update in one
donated-carry program.  Usage:

    python tpu_tag_continuous_train.py smoke   # 12 iterations, timing
    python tpu_tag_continuous_train.py full    # ~2000 iterations
"""

import json
import sys

sys.path.insert(0, "/root/repo")


def make_config(num_envs, num_iters, seed=31):
    episode_length = 500
    batch = num_envs * episode_length  # one full episode per iteration
    num_episodes = num_iters * batch // episode_length
    policy = dict(
        to_train=True,
        algorithm="A2C",
        vf_loss_coeff=1,
        entropy_coeff=0.05,
        clip_grad_norm=True,
        max_grad_norm=0.5,
        normalize_advantage=False,
        normalize_return=False,
        gamma=0.98,
        model={"type": "fully_connected", "fc_dims": [256, 256]},
    )
    return {
        "name": "tag_continuous",
        "env": {
            "num_taggers": 5,
            "num_runners": 100,
            "grid_length": 20.0,
            "episode_length": episode_length,
            "max_acceleration": 0.1,
            "min_acceleration": -0.1,
            "max_turn": 2.35619449,
            "min_turn": -2.35619449,
            "num_acceleration_levels": 10,
            "num_turn_levels": 10,
            "skill_level_runner": 1.0,
            "skill_level_tagger": 1.0,
            "max_speed": 1.0,
            "seed": 274880,
            "use_full_observation": False,
            "runner_exits_game_after_tagged": True,
            "num_other_agents_observed": 10,
            "tag_reward_for_tagger": 10.0,
            "tag_penalty_for_runner": -10.0,
            "end_of_game_reward_for_runner": 1.0,
            "tagging_distance": 0.02,
            "knn_algorithm": "pallas_mxu_exact",
        },
        "trainer": {
            "num_envs": num_envs,
            "num_episodes": num_episodes,
            "train_batch_size": batch,
            "seed": seed,
            "evaluator": True,
        },
        "policy": {
            "runner": dict(policy, lr=0.005),
            "tagger": dict(policy, lr=0.001),
        },
        "saving": {
            "metrics_log_freq": 50,
            "model_params_save_freq": 1000,
            "basedir": "/root/repo/artifacts/round3",
            "name": "tag_continuous_tpu_exact",
            "tag": f"a2c_seed{seed}",
        },
    }


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    # 100 envs = the reference's own tag_continuous.yaml scale; the A2C
    # update materializes first-layer activations for the whole batch
    # (T=500 x E x N x 256 f32), so 400 envs OOMs a 16 GB chip
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 31
    num_iters = 12 if mode == "smoke" else 2000

    import jax

    print(json.dumps({"stage": "start", "mode": mode,
                      "platform": jax.devices()[0].platform,
                      "num_envs": num_envs, "num_iters": num_iters}),
          flush=True)

    from warpdrive_tpu.training.scripts.train import setup_trainer_and_train

    cfg = make_config(num_envs, num_iters, seed)
    trainer = setup_trainer_and_train(
        cfg,
        results_dir=f"/root/repo/artifacts/round3/tag_continuous_tpu_exact/seed{seed}",
        verbose=True,
    )
    prof = trainer.profile_phases(repeats=3)
    print(json.dumps({"stage": "profile",
                      **{k: round(v, 2) for k, v in prof.items()}}),
          flush=True)
    print(json.dumps({"stage": "done"}), flush=True)


if __name__ == "__main__":
    main()
