"""
Standalone policy export / inference loading (serving path).

Beyond reference parity (the reference can only restore checkpoints into a
full trainer+env stack): ``export_policy`` writes a self-contained bundle —
flax param bytes plus a JSON manifest of the model architecture and flat
observation size — and ``load_policy`` rebuilds a jitted, engine-free
``act(obs[, key, argmax])`` function from it.  This is the deployment
artifact: serving a trained policy requires neither the environment nor the
trainer, only this module and the bundle directory.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization

from warpdrive_tpu.models.factory import ModelFactory

MANIFEST = "manifest.json"
PARAMS = "params.msgpack"


def export_policy(trainer, policy: str, out_dir: str) -> str:
    """
    Export one trained policy from a trainer into ``out_dir``.

    The bundle holds the live params (post-training carry) and everything
    needed to rebuild the network: model type/kwargs, per-component head
    sizes, and the flattened observation width.
    """
    os.makedirs(out_dir, exist_ok=True)
    assert policy in trainer.policies, (
        f"unknown policy {policy!r}; have {trainer.policies}"
    )
    model_cfg = trainer.config["policy"][policy]["model"]
    heads, act_dtype, is_det = trainer._action_heads(policy)
    from warpdrive_tpu.utils.spaces import get_flattened_obs_size

    obs_size = int(get_flattened_obs_size(trainer.obs_space[policy]))
    if is_det:
        # DDPG actor: deterministic bounded tanh head.  The bundle holds
        # the ACTOR net only (serving needs no critic) and the scale/bias
        # the trainer built it with.
        actor = trainer.actor_models[policy]
        manifest = {
            "kind": "ddpg_actor",
            "policy": policy,
            "model_type": model_cfg["actor"]["type"],
            "fc_dims": list(model_cfg["actor"]["fc_dims"]),
            "num_action_types": int(actor.num_action_types),
            "action_scale": float(actor.action_scale),
            "action_bias": float(actor.action_bias),
            "obs_size": obs_size,
        }
        params = jax.device_get(trainer._current_params(policy)["actor"])
    else:
        manifest = {
            "kind": "categorical",
            "policy": policy,
            "model_type": model_cfg["type"],
            "fc_dims": list(model_cfg["fc_dims"]),
            "output_dims": [int(h) for h in heads],
            "dtype": model_cfg.get("dtype") or "float32",
            "obs_size": obs_size,
        }
        params = jax.device_get(trainer._current_params(policy))
    with open(os.path.join(out_dir, MANIFEST), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2)
    with open(os.path.join(out_dir, PARAMS), "wb") as f:
        f.write(serialization.to_bytes(params))
    return out_dir


def load_policy(bundle_dir: str):
    """
    Load an exported bundle and return ``(act, manifest)``.

    ``act(obs, key=None, argmax=True, action_mask=None)`` takes observations
    of shape ``(..., obs_size)`` (any leading batch axes) and returns int32
    actions ``(..., num_components)``; pass ``argmax=False`` with a PRNG key
    for stochastic sampling.
    """
    with open(os.path.join(bundle_dir, MANIFEST), encoding="utf-8") as f:
        manifest = json.load(f)
    if manifest.get("kind", "categorical") == "ddpg_actor":
        return _load_ddpg_actor(bundle_dir, manifest)
    model_cls = ModelFactory.create(manifest["model_type"])
    kwargs = {}
    if manifest.get("dtype") and manifest["dtype"] != "float32":
        kwargs["dtype"] = jnp.dtype(manifest["dtype"])
    model = model_cls(
        fc_dims=tuple(manifest["fc_dims"]),
        output_dims=tuple(manifest["output_dims"]),
        **kwargs,
    )
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, manifest["obs_size"]), jnp.float32),
    )
    with open(os.path.join(bundle_dir, PARAMS), "rb") as f:
        params = serialization.from_bytes(
            jax.device_get(template), f.read()
        )

    from warpdrive_tpu.sampling.samplers import sample_from_logits

    @jax.jit
    def _argmax_act(obs, action_mask):
        logits_list, _ = model.apply(params, obs, action_mask=action_mask)
        return jnp.stack(
            [jnp.argmax(l, axis=-1).astype(jnp.int32) for l in logits_list],
            axis=-1,
        )

    @jax.jit
    def _sample_act(obs, key, action_mask):
        logits_list, _ = model.apply(params, obs, action_mask=action_mask)
        keys = jax.random.split(key, len(logits_list))
        return jnp.stack(
            [
                sample_from_logits(k, l)
                for k, l in zip(keys, logits_list)
            ],
            axis=-1,
        )

    def act(obs, key=None, argmax: bool = True, action_mask=None):
        obs = jnp.asarray(obs, jnp.float32)
        assert obs.shape[-1] == manifest["obs_size"], (
            f"expected trailing obs dim {manifest['obs_size']}, "
            f"got {obs.shape}"
        )
        if argmax:
            return np.asarray(_argmax_act(obs, action_mask))
        assert key is not None, "stochastic acting needs a PRNG key"
        return np.asarray(_sample_act(obs, key, action_mask))

    return act, manifest


def _load_ddpg_actor(bundle_dir: str, manifest: dict):
    """Rebuild a jitted DDPG actor ``act(obs)`` from its bundle.

    The deterministic bounded ``tanh * scale + bias`` head IS the serving
    policy (exploration noise is a training-time concern); ``key``/
    ``argmax`` are accepted for signature parity and ignored.
    """
    model_cls = ModelFactory.create(manifest["model_type"])
    model = model_cls(
        fc_dims=tuple(manifest["fc_dims"]),
        num_action_types=int(manifest["num_action_types"]),
        action_scale=float(manifest["action_scale"]),
        action_bias=float(manifest["action_bias"]),
    )
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, manifest["obs_size"]), jnp.float32),
    )
    with open(os.path.join(bundle_dir, PARAMS), "rb") as f:
        params = serialization.from_bytes(jax.device_get(template), f.read())

    @jax.jit
    def _det_act(obs):
        return model.apply(params, obs)

    def act(obs, key=None, argmax: bool = True, action_mask=None):
        obs = jnp.asarray(obs, jnp.float32)
        assert obs.shape[-1] == manifest["obs_size"], (
            f"expected trailing obs dim {manifest['obs_size']}, "
            f"got {obs.shape}"
        )
        return np.asarray(_det_act(obs))

    return act, manifest
