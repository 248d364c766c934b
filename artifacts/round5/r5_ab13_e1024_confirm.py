"""r5_ab13: confirm E=1024 vs E=1000 for BOTH flagship stages
(env-only exact + full loop) on the final tree, reversed build order
vs r5_ab12 to rule out process-order effects.  5 fresh-key chained
repeats, value-fetch per repeat."""
import json
import sys

import jax

sys.path.insert(0, "/root/repo")
from bench import rollout_rate_stats  # noqa: E402
from warpdrive_tpu.presets import build_flagship  # noqa: E402
import jax.numpy as jnp  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab13_results.jsonl"


def main():
    print("acquiring device...", flush=True)
    print(f"device: {jax.devices()[0].platform}", flush=True)
    n_steps = 500
    for num_envs in (1024, 1000):  # reversed vs ab12
        sys_ = build_flagship(num_envs=num_envs, fc_dims=(256, 256), seed=0)
        key = jax.random.PRNGKey(7)
        env_stats = rollout_rate_stats(
            sys_["env_only_step"], (sys_["state"], jnp.zeros(())),
            n_steps, num_envs, key, repeats=5,
        )
        rec = {"stage": "env_only", "num_envs": num_envs,
               **{k: round(v) for k, v in env_stats.items()}}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        full_stats = rollout_rate_stats(
            sys_["full_loop_step"], sys_["state"], n_steps, num_envs,
            jax.random.PRNGKey(8), params=sys_["params"], repeats=5,
        )
        rec = {"stage": "full_loop", "num_envs": num_envs,
               **{k: round(v) for k, v in full_stats.items()}}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        del sys_
    print("done", flush=True)


if __name__ == "__main__":
    main()
