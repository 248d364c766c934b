"""The create-your-own-env tutorial's code must actually run: extract the
python blocks from docs/tutorial-5 and execute them (numpy reference, TPU
context, registration + consistency check)."""

import pathlib
import re

DOC = pathlib.Path(__file__).parent.parent / (
    "docs/tutorial-5-create-your-own-environment.md"
)


def _python_blocks(text):
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


def test_tutorial_code_blocks_run():
    blocks = _python_blocks(DOC.read_text())
    assert len(blocks) >= 3, "tutorial lost its code blocks"
    ns = {}
    # numpy reference, TPU context, register + consistency check
    for block in blocks[:3]:
        exec(compile(block, str(DOC), "exec"), ns)  # noqa: S102
    assert "Collect" in ns and "TpuCollect" in ns

    # the registered env trains end-to-end with the documented config shape
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    engine = EnvEngine(
        env_obj=ns["TpuCollect"](num_agents=3, episode_length=20),
        num_envs=8,
        seed=0,
    )
    assert engine.has_split_step  # the tutorial's fast path is wired
    cfg = {
        "name": "collect",
        "env": {"num_agents": 3, "episode_length": 20},
        "trainer": {"num_envs": 8, "num_episodes": 80,
                    "train_batch_size": 160, "seed": 1},
        "policy": {"shared": {"to_train": True, "algorithm": "A2C",
                              "gamma": 0.95, "lr": 0.001,
                              "model": {"type": "fully_connected",
                                        "fc_dims": [32, 32]}}},
        "saving": {"metrics_log_freq": 5, "model_params_save_freq": 1000,
                   "basedir": "/tmp", "name": "collect", "tag": "t"},
    }
    trainer = TrainerA2C(env_wrapper=engine, config=cfg, verbose=False)
    trainer.train()
    rew, steps = trainer.evaluate_episodes(use_argmax=True)
    assert rew["shared"].shape == (8, 3)
    # the logged-episode pipeline works on the tutorial env too
    traj = trainer.fetch_logged_episode()
    assert traj["pos"].shape[1] == 3
