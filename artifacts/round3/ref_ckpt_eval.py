"""
Load the REFERENCE's published 1B-step TagContinuous checkpoints
(torch state_dicts shipped with its tutorial-5:
/root/reference/tutorials/assets/tag_continuous_training/
{tagger,runner}_1000010000.state_dict) into warpdrive-tpu's
FullyConnected policies and evaluate them with OUR honest done-masked
argmax evaluator, side by side with our own on-chip-trained policies —
the strongest offline check that the two frameworks train the same game
the same way (BASELINE.json "learning curves match").

Obs-layout adapter: the reference's kNN observation is FEATURE-MAJOR
7-per-slot (5 rel feats x k, types x k, still x k, time -> 7k+1 = 71 for
k=10; reference tag_continuous.py:521-609), while warpdrive-tpu's is
SLOT-MAJOR 8-per-slot with an extra per-slot `valid` flag (8k+1 = 81) —
a deliberate TPU layout (8 contiguous lanes per slot).  For a VALID slot
the neighbor is necessarily alive, so our `still` column == our `valid`
column == the reference's `still` entry, and every reference input is a
permutation of ours: ref (f*k + s) <- ours (s*8 + f) for f < 7, ref 7k
(time) <- ours 8k.  The torch Linear weights (out, in) transpose into
flax Dense kernels (in, out) with the input rows permuted accordingly;
our extra `valid` rows get zero weights (the reference never saw them).

Usage:  python ref_ckpt_eval.py [our_ckpt_dir]
  our_ckpt_dir: directory containing our trained
  {tagger,runner}_<steps>.state_dict (default: the round-3 curve run).
"""

import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

REF_DIR = "/root/reference/tutorials/assets/tag_continuous_training"
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ref_ckpt_eval_results.jsonl")


def emit(obj):
    line = json.dumps(obj)
    print("[RESULT] " + line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def ref_state_dict_to_flax(sd, k_nbr: int, our_obs_dim: int):
    """torch (out,in) Linear stack -> our FullyConnected flax params with
    the obs-permutation adapter on the first layer."""
    import numpy as np

    def t(name):
        return np.asarray(sd[name].detach().cpu().numpy())

    w0 = t("fc.0.0.weight").T  # (71, 256)
    ref_in = w0.shape[0]
    assert ref_in == 7 * k_nbr + 1, ref_in
    kernel0 = np.zeros((our_obs_dim, w0.shape[1]), dtype=np.float32)
    for f in range(7):
        for s in range(k_nbr):
            kernel0[s * 8 + f] = w0[f * k_nbr + s]
    kernel0[8 * k_nbr] = w0[7 * k_nbr]  # time
    params = {
        "Dense_0": {"kernel": kernel0, "bias": t("fc.0.0.bias")},
        "Dense_1": {"kernel": t("fc.1.0.weight").T,
                    "bias": t("fc.1.0.bias")},
        "policy_head_0": {"kernel": t("policy_head.0.weight").T,
                          "bias": t("policy_head.0.bias")},
        "policy_head_1": {"kernel": t("policy_head.1.weight").T,
                          "bias": t("policy_head.1.bias")},
        "vf_head": {"kernel": t("vf_head.weight").T,
                    "bias": t("vf_head.bias")},
    }
    import jax.numpy as jnp
    return {"params": {kk: {n: jnp.asarray(v) for n, v in vv.items()}
                       for kk, vv in params.items()}}


def build_trainer(num_envs=100, seed=31):
    from warpdrive_tpu.envs.engine import EnvEngine
    from warpdrive_tpu.envs.tag_continuous import TpuTagContinuous
    from warpdrive_tpu.presets import FLAGSHIP_ENV_KWARGS
    from warpdrive_tpu.training.trainer_a2c import TrainerA2C

    env = TpuTagContinuous(**dict(FLAGSHIP_ENV_KWARGS, seed=274880))
    engine = EnvEngine(env_obj=env, num_envs=num_envs, seed=seed)
    pmap = {
        "tagger": [i for i in range(env.num_agents)
                   if env.agent_type[i] == 1],
        "runner": [i for i in range(env.num_agents)
                   if env.agent_type[i] == 0],
    }
    pol = {"to_train": True, "algorithm": "A2C", "vf_loss_coeff": 1,
           "entropy_coeff": 0.05, "clip_grad_norm": True,
           "max_grad_norm": 0.5, "gamma": 0.98, "lr": 0.001,
           "model": {"type": "fully_connected", "fc_dims": [256, 256]}}
    cfg = {
        "name": "ref_ckpt_eval", "env": {},
        "trainer": {"num_envs": num_envs, "num_episodes": 4 * num_envs,
                    "train_batch_size": 500 * num_envs, "seed": 7,
                    "evaluator": True},
        "policy": {"runner": dict(pol, lr=0.005), "tagger": dict(pol)},
        "saving": {"metrics_log_freq": 10**9,
                   "model_params_save_freq": 10**9,
                   "basedir": "/tmp", "name": "refeval", "tag": "t"},
    }
    return TrainerA2C(env_wrapper=engine, config=cfg,
                      policy_tag_to_agent_id_map=pmap, verbose=False)


def eval_pairing(trainer, label, n_rounds=3):
    import numpy as np

    tag_rewards, run_rewards = [], []
    for _ in range(n_rounds):
        rew, _steps = trainer.evaluate_episodes(use_argmax=True)
        tag_rewards.append(float(np.mean(rew["tagger"].sum(axis=1))))
        run_rewards.append(float(np.mean(rew["runner"].sum(axis=1))))
    out = {"stage": "eval", "pairing": label,
           "tagger_eval_reward_mean": round(float(np.mean(tag_rewards)), 2),
           "tagger_eval_reward_std": round(float(np.std(tag_rewards)), 2),
           "runner_eval_reward_mean": round(float(np.mean(run_rewards)), 2),
           "runner_eval_reward_std": round(float(np.std(run_rewards)), 2),
           "rounds": n_rounds}
    emit(out)
    return out


def main():
    import torch

    import jax

    print("[refeval] acquiring device...", flush=True)
    print(f"[refeval] device: {jax.devices()[0].platform}", flush=True)

    our_dir = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/repo/artifacts/round3/tag_continuous_tpu_exact")

    trainer = build_trainer()
    k_nbr = trainer.engine.env.num_other_agents_observed
    obs_dim = 8 * k_nbr + 1

    ref_params = {}
    for tag in ("tagger", "runner"):
        sd = torch.load(f"{REF_DIR}/{tag}_1000010000.state_dict",
                        map_location="cpu", weights_only=True)
        ref_params[tag] = ref_state_dict_to_flax(sd, k_nbr, obs_dim)

    def find_ours(tag):
        import re
        def steps(p):
            m = re.search(r"_(\d+)\.state_dict$", p)
            return int(m.group(1)) if m else -1
        cands = sorted(
            (p for p in glob.glob(f"{our_dir}/**/{tag}_*.state_dict",
                                  recursive=True) if steps(p) >= 0),
            key=steps)
        return cands[-1] if cands else None

    # 1) untrained baseline (fresh init)
    eval_pairing(trainer, "untrained_vs_untrained")

    def set_params(tag, p):
        trainer.params[tag] = p
        trainer._rebuild_carry_params([tag])

    # 2) reference 1B-step policies, both sides
    set_params("tagger", ref_params["tagger"])
    set_params("runner", ref_params["runner"])
    eval_pairing(trainer, "ref1B_tagger_vs_ref1B_runner")

    # 3) our policies (if checkpoints exist)
    ours = {t: find_ours(t) for t in ("tagger", "runner")}
    if all(ours.values()):
        trainer.load_model_checkpoint(ours)
        eval_pairing(trainer, "ours_tagger_vs_ours_runner")
        # 4) cross-plays: our tagger vs ref runner and vice versa
        set_params("runner", ref_params["runner"])
        eval_pairing(trainer, "ours_tagger_vs_ref1B_runner")
        trainer.load_model_checkpoint(ours)
        set_params("tagger", ref_params["tagger"])
        eval_pairing(trainer, "ref1B_tagger_vs_ours_runner")
    else:
        emit({"stage": "eval", "note": f"no our-checkpoints in {our_dir}"})

    emit({"stage": "done"})


if __name__ == "__main__":
    main()
