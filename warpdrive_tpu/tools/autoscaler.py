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
import re
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
    trainer = setup_trainer_and_train(
        run_config, env_setup=env_setup, verbose=False
    )
    # measured post-compile rate: the scaler selects the highest-THROUGHPUT
    # feasible config, not merely the largest (deep storage knobs fit more
    # but can train slower)
    try:
        rate = trainer.profile_phases(repeats=2)["steps_per_sec"]
    except Exception:  # noqa: BLE001 — rate is advisory; fit result stands
        rate = 0.0
    print(f"PROBE_OK steps_per_sec={rate:.1f}")
except Exception as e:  # noqa: BLE001 — any failure means "does not fit"
    print(f"PROBE_FAIL: {type(e).__name__}: {e}")
    sys.exit(1)
"""


def _probe(
    run_config: dict, env_setup, timeout_s: int = None
) -> "tuple[bool, float | None]":
    """Run one trial config in a fresh subprocess.

    Returns ``(fits, steps_per_sec)``: ``fits`` is whether the config
    compiled and ran; ``steps_per_sec`` is its measured post-compile rate
    (``None`` when unavailable).  Do NOT truth-test the tuple — ``(False,
    None)`` is truthy; unpack it.

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
        rate = None
        if ok:
            m = re.search(r"steps_per_sec=([\d.]+)", proc.stdout)
            rate = float(m.group(1)) if m else None
            logging.info(
                "autoscaler probe ok (num_envs=%s batch=%s): %s steps/s",
                run_config["trainer"]["num_envs"],
                run_config["trainer"]["train_batch_size"],
                f"{rate:.0f}" if rate else "unmeasured",
            )
            return True, rate
        logging.info(
            "autoscaler probe failed (num_envs=%s batch=%s): %s",
            run_config["trainer"]["num_envs"],
            run_config["trainer"]["train_batch_size"],
            (proc.stdout + proc.stderr)[-500:],
        )
        return False, None
    except subprocess.TimeoutExpired:
        logging.warning(
            "autoscaler probe timed out after %ss — treating as infeasible. "
            "NOTE: if this probe was on the TPU backend, the killed client "
            "may wedge the single-tenant chip claim for a while "
            "(docs/performance.md).",
            timeout_s,
        )
        return False, None
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
    minibatching, then the trainer-level storage levers) before declaring
    the size infeasible — the chosen rung is monotone over the search (a
    knob needed at N envs stays on for >N) and the selected knobs are
    written into the returned config.  Every successful probe also reports
    its measured training rate, and the FINAL config is the highest-
    THROUGHPUT feasible one seen — not merely the largest: the deepest
    storage knobs (e.g. ``update_recompute_obs``) trade speed for fit, so
    the size-max config can train slower than smaller rungs (measured on
    the chip: 1600 envs @ rung-5 ran 7x slower than 800 @ rung-3).

    ``probe_fn(run_config, env_setup) -> bool | (bool, steps_per_sec)`` is
    injectable for tests.
    """
    raw_probe = probe_fn or _probe
    base = copy.deepcopy(run_config)
    base_envs = int(base["trainer"]["num_envs"])
    batch_per_env = max(
        1, int(base["trainer"]["train_batch_size"]) // base_envs
    )
    ladder = MEMORY_KNOB_LADDER if use_memory_knobs else ({},)
    state = {"rung": 0}
    measured = []  # (steps_per_sec, num_envs, mult, rung) for successes

    def probe(trial, rung, mult=1):
        res = raw_probe(trial, env_setup)
        ok, rate = res if isinstance(res, tuple) else (res, None)
        if ok and rate:
            measured.append(
                (float(rate), int(trial["trainer"]["num_envs"]), mult, rung)
            )
        return ok

    def envs_valid(num_envs: int) -> bool:
        for rung in range(state["rung"], len(ladder)):
            trial = _with_knobs(base, ladder[rung], num_envs)
            trial["trainer"]["num_envs"] = num_envs
            trial["trainer"]["train_batch_size"] = num_envs * batch_per_env
            if probe(trial, rung):
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
        return probe(trial, state["rung"], mult)

    logging.info("autoscaler: searching max batch multiple at %d envs ...", best_envs)
    best_mult = best_param_search(batch_valid, low=1)

    if measured:
        # throughput-aware final selection among every feasible probe
        rate, t_envs, t_mult, t_rung = max(measured)
        size_max = (best_envs, best_mult, state["rung"])
        if (t_envs, t_mult, t_rung) != size_max:
            logging.info(
                "autoscaler: size-max config %s measured SLOWER than "
                "(envs=%d, mult=%d, rung=%d) at %.0f steps/s — selecting "
                "the throughput winner", size_max, t_envs, t_mult, t_rung,
                rate,
            )
        best_envs, best_mult = t_envs, t_mult
        knobs = ladder[t_rung]

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
