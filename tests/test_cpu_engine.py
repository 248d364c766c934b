"""CPU (python) backend facade (reference EnvWrapper env_backend='cpu')."""

import numpy as np
import pytest

from warpdrive_tpu.envs import register_all_envs
from warpdrive_tpu.envs.cpu_engine import CpuEnvEngine
from warpdrive_tpu.utils.constants import Constants


@pytest.fixture(scope="module", autouse=True)
def _register():
    register_all_envs()


def test_cpu_engine_reset_step_softreset():
    eng = CpuEnvEngine(
        env_name="TagGridWorld",
        env_config={"num_taggers": 3, "grid_length": 6, "episode_length": 4, "seed": 2},
        num_envs=3,
    )
    obs = eng.reset_all_envs()
    assert obs.shape[0] == 3 and obs.shape[1] == eng.n_agents

    for _ in range(4):
        out = eng.step_all_envs(
            np.random.RandomState(0).randint(0, 5, (3, eng.n_agents, 1))
        )
    assert (out[Constants.DONE] > 0).all()
    assert np.isfinite(out[Constants.REWARDS]).all()

    eng.reset_only_done_envs()
    assert (eng._done == 0).all()
