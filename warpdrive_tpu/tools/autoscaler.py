"""
Vertical auto-scaling: find the largest env count / batch size that fits.

Parity with reference ``warp_drive/training/utils/vertical_scaler.py:23-185``
(``perform_auto_vertical_scaling`` + ``best_param_search``): the reference
deliberately injects failures — it launches trial runs in subprocesses and
binary-searches the largest ``num_envs`` (then the largest batch multiple)
that neither OOMs nor fails to launch.

On TPU the failure mode probed is XLA HBM exhaustion, which can strike at
COMPILE time (buffer assignment) or at RUN time; both surface as
``RESOURCE_EXHAUSTED`` errors.  Each probe therefore builds the engine +
trainer and executes one full jitted iteration inside a fresh subprocess, so
a failed allocation cannot poison the parent's TPU client.
"""

from __future__ import annotations

import copy
import json
import logging
import os
import subprocess
import sys
import tempfile


def best_param_search(is_valid, low: int = 1, margin: int = 1):
    """
    Largest valid parameter search (reference ``vertical_scaler.py:23-99``):
    exponential doubling from ``low`` until failure, then bisection between
    the last success and the first failure, down to ``margin`` resolution.
    """
    assert low > 0
    if not is_valid(low):
        raise ValueError(f"even the lower bound {low} is not feasible")
    hi = low
    while is_valid(hi * 2):
        hi *= 2
        if hi > 2**24:  # safety rail
            return hi
    lo, hi = hi, hi * 2  # lo valid, hi invalid
    while hi - lo > margin:
        mid = (lo + hi) // 2
        if is_valid(mid):
            lo = mid
        else:
            hi = mid
    return lo


_PROBE_SNIPPET = r"""
import json, sys
payload = json.load(open(sys.argv[1]))
run_config = payload["run_config"]
env_setup = tuple(payload["env_setup"])
try:
    from warpdrive_tpu.training.scripts.train import setup_trainer_and_train
    run_config["trainer"]["num_episodes"] = (
        run_config["trainer"]["train_batch_size"] // 1
    )  # overwritten below
    # exactly one iteration: num_episodes * episode_length == train_batch_size
    from warpdrive_tpu.envs import register_all_envs
    from warpdrive_tpu.utils.env_registrar import env_registrar
    register_all_envs()
    env_cls = env_registrar.get(env_setup[0], backend="tpu")
    probe_env = env_cls(**run_config.get("env", {}))
    ep_len = probe_env.episode_length
    bs = run_config["trainer"]["train_batch_size"]
    run_config["trainer"]["num_episodes"] = max(1, bs // ep_len + 1)
    run_config["saving"]["metrics_log_freq"] = 10**9
    run_config["saving"]["model_params_save_freq"] = 10**9
    setup_trainer_and_train(run_config, env_setup=env_setup, verbose=False)
    print("PROBE_OK")
except Exception as e:  # noqa: BLE001 — any failure means "does not fit"
    print(f"PROBE_FAIL: {type(e).__name__}: {e}")
    sys.exit(1)
"""


def _probe(run_config: dict, env_setup, timeout_s: int = None) -> bool:
    """Run one trial configuration in a fresh subprocess; True if it fits.

    On the TPU backend the timeout is generous (first compiles are slow,
    and SIGKILLing a chip client mid-compile can wedge the single-tenant
    claim — docs/performance.md); expiry is logged loudly.
    """
    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False
    ) as f:
        json.dump({"run_config": run_config, "env_setup": list(env_setup)}, f)
        path = f.name
    env = dict(os.environ)
    on_cpu = env.get("JAX_PLATFORMS", "") == "cpu"
    if timeout_s is None:
        # overridable: a chip-side claim wedge otherwise costs a full hour
        # per subsequent probe (docs/performance.md)
        timeout_s = int(
            os.environ.get("WD_PROBE_TIMEOUT_S", 900 if on_cpu else 3600)
        )
    if on_cpu:
        # CPU probes (tests / machines without a chip) must not run the
        # TPU-plugin sitecustomize hook: its registration can block on the
        # device claim at interpreter start, before any user code runs
        env["PYTHONPATH"] = os.pathsep.join(
            p
            for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        )
        env.pop("PALLAS_AXON_POOL_IPS", None)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SNIPPET, path],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            check=False,
            env=env,
        )
        ok = proc.returncode == 0 and "PROBE_OK" in proc.stdout
        if not ok:
            logging.info(
                "autoscaler probe failed (num_envs=%s batch=%s): %s",
                run_config["trainer"]["num_envs"],
                run_config["trainer"]["train_batch_size"],
                (proc.stdout + proc.stderr)[-500:],
            )
        return ok
    except subprocess.TimeoutExpired:
        logging.warning(
            "autoscaler probe timed out after %ss — treating as infeasible. "
            "NOTE: if this probe was on the TPU backend, the killed client "
            "may wedge the single-tenant chip claim for a while "
            "(docs/performance.md).",
            timeout_s,
        )
        return False
    finally:
        os.unlink(path)


# Memory-knob escalation ladder (beyond reference parity; TPU-specific).
# The update program's activation memory — (T, E, agents, hidden) — is the
# thing that OOMs first on a 16 GB chip (docs/performance.md §8): `remat`
# recomputes activations in the backward pass (numerically exact), and
# `num_minibatches` slices the update over the env axis (exact too: the
# return recursion never crosses envs).  Rung 0 is the config as given;
# each later rung trades a little update speed for a lot of memory.
# Escalation ladder: policy-level knobs (remat, env-axis update
# minibatching) first, then the TRAINER-level storage levers measured on
# the chip in round 3: bfloat16 batch storage halves the dominant stored
# rollout (the (T, E, N, obs) batch), and update_recompute_obs removes it
# entirely (stores the compact physical state, re-derives obs in the loss
# forward — slower per step, artifacts/round3/r3_ab1, but the strongest
# memory lever).  Keys in _TRAINER_KNOBS apply to trial["trainer"];
# everything else to each trained policy.
MEMORY_KNOB_LADDER = (
    {},
    {"remat": True},
    {"remat": True, "num_minibatches": 4},
    {"remat": True, "num_minibatches": 8, "batch_dtype": "bfloat16"},
    {"remat": True, "num_minibatches": 8, "batch_dtype": "bfloat16",
     "update_recompute_obs": True},
)

_TRAINER_KNOBS = ("batch_dtype", "update_recompute_obs")


def _effective_minibatches(num_envs: int, target: int) -> int:
    """Largest divisor of ``num_envs`` that is <= ``target`` (the env-axis
    minibatch count must divide the env count exactly)."""
    mb = max(1, min(target, num_envs))
    while num_envs % mb:
        mb -= 1
    return mb


def _with_knobs(run_config: dict, knobs: dict, num_envs: int) -> dict:
    trial = copy.deepcopy(run_config)
    pol_knobs = {k: v for k, v in knobs.items() if k not in _TRAINER_KNOBS}
    for pol in trial.get("policy", {}).values():
        if pol.get("to_train", True) and pol_knobs:
            eff = dict(pol_knobs)
            if "num_minibatches" in eff:
                eff["num_minibatches"] = _effective_minibatches(
                    num_envs, eff["num_minibatches"]
                )
            pol.update(eff)
    for k in _TRAINER_KNOBS:
        if k in knobs:
            trial["trainer"][k] = knobs[k]
    return trial


def perform_auto_vertical_scaling(
    run_config: dict,
    env_setup,
    use_memory_knobs: bool = True,
    probe_fn=None,
) -> dict:
    """
    Find the largest feasible ``num_envs`` (keeping batch-per-env constant),
    then the largest feasible ``train_batch_size`` multiple at that env count
    (reference ``vertical_scaler.py:102-185``).  Returns an updated copy of
    the run config.

    Beyond the reference: when a trial does not fit, the scaler escalates
    through :data:`MEMORY_KNOB_LADDER` (``remat``, then env-axis update
    minibatching) before declaring the size infeasible — the chosen rung is
    monotone over the search (a knob needed at N envs stays on for >N) and
    the selected knobs are written into the returned config.

    ``probe_fn(run_config, env_setup) -> bool`` is injectable for tests.
    """
    probe = probe_fn or _probe
    base = copy.deepcopy(run_config)
    base_envs = int(base["trainer"]["num_envs"])
    batch_per_env = max(
        1, int(base["trainer"]["train_batch_size"]) // base_envs
    )
    ladder = MEMORY_KNOB_LADDER if use_memory_knobs else ({},)
    state = {"rung": 0}

    def envs_valid(num_envs: int) -> bool:
        for rung in range(state["rung"], len(ladder)):
            trial = _with_knobs(base, ladder[rung], num_envs)
            trial["trainer"]["num_envs"] = num_envs
            trial["trainer"]["train_batch_size"] = num_envs * batch_per_env
            if probe(trial, env_setup):
                if rung != state["rung"]:
                    logging.info(
                        "autoscaler: escalating memory knobs to %s at "
                        "%d envs", ladder[rung], num_envs,
                    )
                state["rung"] = rung
                return True
        return False

    logging.info("autoscaler: searching max num_envs from %d ...", base_envs)
    best_envs = best_param_search(envs_valid, low=base_envs)
    knobs = ladder[state["rung"]]

    def batch_valid(mult: int) -> bool:
        trial = _with_knobs(base, knobs, best_envs)
        trial["trainer"]["num_envs"] = best_envs
        trial["trainer"]["train_batch_size"] = best_envs * batch_per_env * mult
        return probe(trial, env_setup)

    logging.info("autoscaler: searching max batch multiple at %d envs ...", best_envs)
    best_mult = best_param_search(batch_valid, low=1)

    out = _with_knobs(run_config, knobs, best_envs)
    out["trainer"]["num_envs"] = best_envs
    out["trainer"]["train_batch_size"] = best_envs * batch_per_env * best_mult
    # scale the episode budget with the env count so the scaled config
    # still runs the base config's iteration count (a 10x env scale-up
    # with the base num_episodes would not cover even ONE iteration —
    # TrainerBase rejects that; reference vertical_scaler.py keeps
    # num_episodes user-owned but its trainer floors at 1 iteration)
    if "num_episodes" in out.get("trainer", {}):
        scale = max(1, (best_envs * best_mult + base_envs - 1) // base_envs)
        out["trainer"]["num_episodes"] = int(
            out["trainer"]["num_episodes"] * scale
        )
    logging.info(
        "autoscaler: selected num_envs=%d train_batch_size=%d "
        "num_episodes=%s knobs=%s",
        out["trainer"]["num_envs"],
        out["trainer"]["train_batch_size"],
        out["trainer"].get("num_episodes"),
        knobs,
    )
    return out
