"""Checkpointing with resume.

Keeps the reference's two-name scheme — rolling `checkpoint` + `best_model`
on validation improvement (/root/reference/training.py:218-233, :498-519) —
and adds what the reference lacks: an actual --resume path (train.py has
none even though optimizer state is saved; SURVEY.md §5).

Format: a directory containing
  <name>.msgpack   flax-serialized {params, batch_stats, opt_state}
  <name>.json      step counters, stats histories, config
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_checkpoint(model_dir: str, name: str, state_tree: Any,
                    meta: dict) -> None:
    os.makedirs(model_dir, exist_ok=True)
    state_tree = jax.device_get(state_tree)
    path = os.path.join(model_dir, name + ".msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state_tree))
    os.replace(tmp, path)
    with open(os.path.join(model_dir, name + ".json"), "w") as f:
        json.dump(_jsonable(meta), f)


def load_checkpoint(model_dir: str, name: str, state_template: Any):
    path = os.path.join(model_dir, name + ".msgpack")
    with open(path, "rb") as f:
        state = serialization.from_bytes(state_template, f.read())
    meta_path = os.path.join(model_dir, name + ".json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def latest_exists(model_dir: str, name: str = "checkpoint") -> bool:
    return os.path.exists(os.path.join(model_dir, name + ".msgpack"))


def _jsonable(x):
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, (np.generic,)):
        return x.item()
    if isinstance(x, np.ndarray):
        return x.tolist()
    if hasattr(x, "item") and getattr(x, "ndim", None) == 0:
        return x.item()
    return x
