"""The quickstart document's code must actually run end-to-end: extract
the python blocks from docs/quickstart.md and execute them verbatim
(config -> engine -> two-policy training -> done-masked eval)."""

import pathlib
import re

DOC = pathlib.Path(__file__).parent.parent / "docs/quickstart.md"


def _python_blocks(text):
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


def test_quickstart_blocks_run():
    blocks = _python_blocks(DOC.read_text())
    assert len(blocks) == 3, "quickstart lost a code block"
    ns = {}
    for block in blocks:
        exec(compile(block, str(DOC), "exec"), ns)  # noqa: S102

    trainer = ns["trainer"]
    assert trainer.current_timestep >= ns["run_config"]["trainer"][
        "num_episodes"
    ] * ns["run_config"]["env"]["episode_length"]
    # two policies actually trained and evaluated
    assert set(ns["eval_rewards"]) == {"tagger", "runner"}
    assert ns["eval_rewards"]["tagger"].shape[0] == 10  # num_envs
    # the policy map covered all agents
    assert len(ns["policy_tag_to_agent_id_map"]["tagger"]) == 5
    assert len(ns["policy_tag_to_agent_id_map"]["runner"]) == 20
