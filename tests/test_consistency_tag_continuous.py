"""CPU vs TPU consistency for TagContinuous across scenario configs
(parity with reference tests/example_envs/numba_tests/test_tag_continuous.py)."""

from warpdrive_tpu.envs.tag_continuous import TagContinuous, TpuTagContinuous
from warpdrive_tpu.tools.consistency import EnvironmentCPUvsTPU


def test_tag_continuous_consistency():
    EnvironmentCPUvsTPU(
        cpu_env_class=TagContinuous,
        tpu_env_class=TpuTagContinuous,
        env_configs={
            "full_obs": {
                "num_taggers": 2,
                "num_runners": 8,
                "grid_length": 20.0,
                "episode_length": 30,
                "use_full_observation": True,
                "seed": 274880,
            },
            "partial_obs": {
                "num_taggers": 3,
                "num_runners": 9,
                "grid_length": 20.0,
                "episode_length": 30,
                "use_full_observation": False,
                "num_other_agents_observed": 4,
                "seed": 274880,
            },
            "easy_tagging": {
                # large tagging distance so runners actually exit the game
                "num_taggers": 4,
                "num_runners": 6,
                "grid_length": 5.0,
                "episode_length": 40,
                "use_full_observation": True,
                "tagging_distance": 0.25,
                "seed": 11,
            },
            "runners_stay": {
                "num_taggers": 2,
                "num_runners": 4,
                "grid_length": 5.0,
                "episode_length": 25,
                "tagging_distance": 0.3,
                "runner_exits_game_after_tagged": False,
                "seed": 13,
            },
        },
        num_envs=3,
        num_episodes=2,
    ).test_env_reset_and_step(threshold_pct=1.0, seed=41)
