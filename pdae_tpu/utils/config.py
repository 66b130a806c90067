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


def apply_overrides(config: dict, overrides, dotted: bool = True) -> dict:
    """Apply CLI ``key=value`` overrides to a config dict in place.

    Shared by the train/sample launchers (``--set``).  Keys may be dotted
    paths into nested mappings when ``dotted``; values parse as python
    literals when possible (numbers, lists, bools), else raw strings.  An
    empty YAML section header parses to None -- treated as an empty
    mapping so ``--set runner_config.x=y`` works on bare configs."""
    for kv in overrides:
        if "=" not in kv:
            raise SystemExit(f"--set expects key=value, got {kv!r}")
        key, val = kv.split("=", 1)
        try:
            val = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        parts = key.split(".") if dotted else [key]
        node = config
        for part in parts[:-1]:
            child = node.get(part)
            if child is None:
                child = node[part] = {}
            if not isinstance(child, dict):
                raise SystemExit(f"--set path {key!r}: {part!r} is not a "
                                 f"mapping in the config")
            node = child
        node[parts[-1]] = val
    return config


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
