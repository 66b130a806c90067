"""YAML config loading with the reference's overlay semantics.

The reference loads a train config and derives the eval config by
dict-update overlay (``/root/reference/trainer/base_trainer.py:63-65``),
parses ``adam_betas`` strings like "(0.9, 0.999)" (with ``eval()``,
``trainer/train_regular_diffusion.py:54`` -- we use ``ast.literal_eval``),
and multi-stage configs point at *other runs'* config files on disk
(``config/celeba64_latent.yml:13-16``).
"""

from __future__ import annotations

import ast
import json
import os
import pickle
from typing import Any, Optional

import yaml


def load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def save_yaml(obj: Any, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(obj, f, sort_keys=False)


def load_json(path: str) -> Any:
    with open(path, "r") as f:
        return json.load(f)


def save_json(obj: Any, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(obj: Any, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def overlay_eval_dataset_config(config: dict) -> dict:
    """eval_dataset_config = train_dataset_config updated by the eval keys
    (reference base_trainer.py:63-65)."""
    merged = dict(config["train_dataset_config"])
    merged.update(config.get("eval_dataset_config") or {})
    return merged


def parse_adam_betas(value) -> tuple:
    """'(0.9, 0.999)' -> (0.9, 0.999); already-parsed sequences pass through."""
    if isinstance(value, str):
        value = ast.literal_eval(value)
    b1, b2 = value
    return (float(b1), float(b2))
