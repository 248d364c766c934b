"""r5_ab16: scan-length protocol A/B for the flagship stages.

The fast-env stages moved to 2000-step scans after the round-5
dispatch post-mortem (per-scan tunnel dispatch of 20-100+ ms dominates
sub-100 ms scans).  The flagship stages still scan 500 steps — at the
E=1024 rates that is ~0.35 s (env-only) / ~0.5 s (full loop) per scan,
so dispatch is a 4-6% tax on the MEASUREMENT, not the program.  A/B
n_steps in {500, 2000} at the bench config; if 2000 is higher, the
delta is dispatch amortization (the device program is identical per
step) and the bench protocol should harmonize."""
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rollout_rate_stats  # noqa: E402
from warpdrive_tpu.presets import build_flagship  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab16_results.jsonl"


def main():
    print("acquiring device...", flush=True)
    print(f"device: {jax.devices()[0].platform}", flush=True)
    num_envs = 1024
    sys_ = build_flagship(num_envs=num_envs, fc_dims=(256, 256), seed=0)
    for n_steps in (500, 2000, 500):  # repeat 500 last to bracket drift
        env_stats = rollout_rate_stats(
            sys_["env_only_step"], (sys_["state"], jnp.zeros(())),
            n_steps, num_envs, jax.random.PRNGKey(11), repeats=5,
        )
        rec = {"stage": "env_only", "n_steps": n_steps,
               **{k: round(v) for k, v in env_stats.items()}}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
    for n_steps in (500, 2000):
        full_stats = rollout_rate_stats(
            sys_["full_loop_step"], sys_["state"], n_steps, num_envs,
            jax.random.PRNGKey(12), params=sys_["params"], repeats=5,
        )
        rec = {"stage": "full_loop", "n_steps": n_steps,
               **{k: round(v) for k, v in full_stats.items()}}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print("done", flush=True)


if __name__ == "__main__":
    main()
