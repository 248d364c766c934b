"""
Model factory: name -> model class registry with dynamic import.

Parity with reference ``warp_drive/training/models/factory.py:4-59``: three
built-ins plus ``"module:ClassName"`` dynamic resolution for user models.
"""

from __future__ import annotations

import importlib

from warpdrive_tpu.models.fully_connected import (
    FullyConnected,
    FullyConnectedActionValueCritic,
    FullyConnectedActor,
)

default_models = {
    "fully_connected": FullyConnected,
    "fully_connected_actor": FullyConnectedActor,
    "fully_connected_action_value_critic": FullyConnectedActionValueCritic,
}


def dynamic_import(path: str):
    """Resolve ``"package.module:ClassName"`` to the class object."""
    assert ":" in path, f"expected 'module:ClassName', got {path!r}"
    module_name, class_name = path.split(":", 1)
    module = importlib.import_module(module_name)
    return getattr(module, class_name)


class ModelFactory:
    """Registry mapping model-type names to flax module classes."""

    @staticmethod
    def create(model_type: str):
        if model_type in default_models:
            return default_models[model_type]
        return dynamic_import(model_type)

    @staticmethod
    def add(name: str, model_class):
        assert name not in default_models, f"{name!r} already registered"
        default_models[name] = model_class
        return model_class
