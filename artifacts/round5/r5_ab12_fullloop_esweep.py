"""r5_ab12: full-loop replica-count sweep on the v9 production kernel.

The round-5 kernel E-sweeps (r5_ab5/ab6) only covered the ENV-ONLY
loop (peak E=1000).  The FULL loop adds the per-step policy forward
(2x (256,256) MLPs over 105 agents) + categorical sampling, whose
MXU/HBM amortization improves with batch — so its optimum may sit at a
larger E than the kernel's.  This sweep times `full_loop_step` at
E in {1000, 1024, 2000, 4000} (5 fresh-key chained repeats each,
value-fetch proof per CLAUDE.md rule 7; E=1500 excluded per the rule-9
pathology).  Rates are env-steps/s (absolute, not per-1000).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import rollout_rate_stats  # noqa: E402
from warpdrive_tpu.presets import build_flagship  # noqa: E402

OUT = "/root/repo/artifacts/round5/r5_ab12_results.jsonl"


def main():
    print("acquiring device...", flush=True)
    dev = jax.devices()[0]
    print(f"device: {dev.platform}", flush=True)
    n_steps = 500
    for num_envs in (1000, 1024, 2000, 4000):
        print(f"building E={num_envs}...", flush=True)
        sys_ = build_flagship(num_envs=num_envs, fc_dims=(256, 256), seed=0)
        key = jax.random.PRNGKey(42)
        t0 = time.perf_counter()
        stats = rollout_rate_stats(
            sys_["full_loop_step"], sys_["state"], n_steps, num_envs, key,
            params=sys_["params"], repeats=5,
        )
        wall = time.perf_counter() - t0
        rec = {
            "stage": "full_loop",
            "num_envs": num_envs,
            "knn_algorithm": sys_["env"].knn_algorithm,
            **{k: round(v) if isinstance(v, float) else v
               for k, v in stats.items()},
            "wall_s": round(wall, 1),
        }
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        del sys_  # free device buffers before the next, larger build
    print("done", flush=True)


if __name__ == "__main__":
    main()
