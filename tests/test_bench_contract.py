"""bench.py driver contract: ONE parseable JSON line on stdout with the
required keys, even when the requested backend is unavailable."""

import json
import os
import subprocess
import sys


def _run(env_overrides):
    env = dict(os.environ)
    env.update(env_overrides)
    # strip the axon sitecustomize so the subprocess doesn't spin on the
    # TPU claim at interpreter start (CLAUDE.md rule 5)
    env["PYTHONPATH"] = ""
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
    assert lines, f"no JSON line on stdout: {out.stdout!r} {out.stderr[-500:]!r}"
    return json.loads(lines[0]), out


def test_bench_emits_json_on_cpu():
    rec, _ = _run({"BENCH_PLATFORM": "cpu"})
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["unit"] == "env_steps/s"
    assert rec["value"] > 0
    assert rec.get("platform") == "cpu"
