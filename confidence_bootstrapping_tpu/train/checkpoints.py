"""Model directory IO: config manifest + weights (+ train state).

Mirrors the reference convention of a model directory holding
``model_parameters.yml`` + ``*.pt`` checkpoints (train.py:145-150,
finetune_train.py:306-323): here a directory holds ``model_config.yml``
(typed dataclass yaml) and msgpack weight bundles; full train state
(params + opt + EMA + epoch) uses the same format.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.serialization
import jax
import numpy as np

from ..config import ScoreModelConfig, load_score_config, save_yaml

CONFIG_NAME = "model_config.yml"


def save_params(path: str, variables: Any):
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(variables)))


def load_params(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def save_model_dir(model_dir: str, cfg: ScoreModelConfig, variables: Any, name: str = "last_model"):
    os.makedirs(model_dir, exist_ok=True)
    save_yaml(cfg, os.path.join(model_dir, CONFIG_NAME))
    save_params(os.path.join(model_dir, f"{name}.msgpack"), variables)


def load_model_dir(model_dir: str, template: Any, name: str = "last_model"):
    cfg = load_score_config(os.path.join(model_dir, CONFIG_NAME))
    variables = load_params(os.path.join(model_dir, f"{name}.msgpack"), template)
    return cfg, variables


def has_checkpoint(model_dir: str, name: str = "last_model") -> bool:
    return os.path.exists(os.path.join(model_dir, f"{name}.msgpack"))


# --- full train-state bundles (reference train.py:145-150 saves
# {epoch, model, optimizer, ema_weights}; --restart_dir restores all of it,
# train.py:194-207). TrainState is a NamedTuple of pytrees, so flax
# serialization round-trips it against a template. ---

STATE_NAME = "last_state"


def save_train_state(model_dir: str, state, epoch: int, name: str = STATE_NAME):
    os.makedirs(model_dir, exist_ok=True)
    bundle = {"state": jax.device_get(state), "epoch": np.int64(epoch)}
    with open(os.path.join(model_dir, f"{name}.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(bundle))


def load_train_state(model_dir: str, template_state, name: str = STATE_NAME):
    """Returns (state, epoch) restored against a freshly-initialized
    template, or (None, 0) when absent/corrupt (the reference falls back to
    best_model on a corrupt bundle; we fall back to weights-only restore)."""
    path = os.path.join(model_dir, f"{name}.msgpack")
    if not os.path.exists(path):
        return None, 0
    template = {"state": template_state, "epoch": np.int64(0)}
    try:
        with open(path, "rb") as f:
            bundle = flax.serialization.from_bytes(template, f.read())
        return bundle["state"], int(bundle["epoch"])
    except Exception as e:
        print(f"corrupt train-state bundle {path} ({type(e).__name__}); ignoring")
        return None, 0
