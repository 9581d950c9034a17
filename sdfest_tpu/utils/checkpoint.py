"""Training checkpoint save/load/resume.

Capability parity with the reference's checkpointing conventions
(/root/reference/sdfest/vae/utils.py:44-88, initialization/scripts/
train.py:483-490): a checkpoint bundles parameters, optimizer state,
iteration counter and run name; final weights are saved together with a
config file referencing them so a config fully identifies a model.

Serialization is flax msgpack (structure restored against a template
pytree), metadata is JSON.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

from flax import serialization


def save_checkpoint(
    path: str,
    state: Any,
    iteration: int,
    run_name: str,
    epoch: int = 0,
) -> None:
    """Write a training checkpoint (state pytree + metadata)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    meta = {"iteration": int(iteration), "run_name": run_name, "epoch": int(epoch)}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, state_template: Any) -> Tuple[Any, Dict]:
    """Load a training checkpoint; returns (state, metadata)."""
    with open(path, "rb") as f:
        state = serialization.from_bytes(state_template, f.read())
    meta_path = path + ".meta.json"
    meta = {"iteration": 0, "run_name": "unknown", "epoch": 0}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta.update(json.load(f))
    return state, meta


def save_model_and_config(
    model_dir: str,
    run_name: str,
    params: Any,
    config: Dict,
    config_key_updates: Optional[Dict] = None,
) -> Tuple[str, str]:
    """Save final weights plus a config referencing them (travel together)."""
    from sdfest_tpu.utils.config import save_config_to_file

    os.makedirs(model_dir, exist_ok=True)
    model_path = os.path.join(model_dir, f"{run_name}.msgpack")
    with open(model_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    config = dict(config)
    config["model"] = os.path.join(".", f"{run_name}.msgpack")
    if config_key_updates:
        config.update(config_key_updates)
    config_path = os.path.join(model_dir, f"{run_name}.yaml")
    save_config_to_file(config_path, config)
    return model_path, config_path
