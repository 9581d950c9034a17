"""Layered YAML configuration system.

A small purpose-built loader with the override semantics of the ``yoco``
library used by the reference system (see /root/reference usage, e.g.
sdfest/vae/scripts/train.py:406-409 and
sdfest/initialization/datasets/nocs_dataset.py:158):

- A YAML mapping may contain a special ``config`` key holding one or more
  paths to other YAML files.  Included files are resolved depth-first and
  merged in order; keys of the including (parent) file override keys from
  the included (child) files, and later includes override earlier ones.
- An include entry may also be a mapping whose string leaves are paths
  (yoco's namespaced include, e.g. ``- vae: "./vae_models/mug.yaml"`` or
  ``- datasets: {generated: {config_dict: "./gen.yaml"}}``): the file is
  loaded into that nested position instead of the top level (reference
  usage: sdfest/initialization/configs/discretized.yaml:1-10).
- Paths are resolved against a list of search paths: the directory of the
  including file (or cwd), ``~/.sdfest_tpu/`` and the installed package
  directory, so packaged configs resolve by relative name.
- Command-line flags merge on top of everything with highest precedence;
  dotted flag names (``--a.b.c value``) create nested dictionaries.
"""
from __future__ import annotations

import argparse
import copy
import os
from typing import List, Optional, Sequence, Union

import yaml


def _package_dir() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def default_search_paths(current_dir: Optional[str] = None) -> List[str]:
    """Return the default search paths for config and resource files."""
    paths = []
    if current_dir is not None:
        paths.append(current_dir)
    paths += [".", os.path.expanduser("~/.sdfest_tpu/"), _package_dir()]
    return paths


def resolve_path(path: str, search_paths: Optional[Sequence[str]] = None) -> str:
    """Resolve a possibly-relative path against the search paths.

    Returns the first existing candidate; if none exists the path expanded
    against the user's home is returned unchanged (callers may create it).
    """
    path = os.path.expanduser(path)
    if os.path.isabs(path):
        return path
    if search_paths is None:
        search_paths = default_search_paths()
    for sp in search_paths:
        candidate = os.path.join(os.path.expanduser(sp), path)
        if os.path.exists(candidate):
            return candidate
    return path


def _deep_merge(base: dict, override: dict) -> dict:
    """Recursively merge ``override`` into ``base`` (override wins)."""
    result = dict(base)
    for key, value in override.items():
        if key in result and isinstance(result[key], dict) and isinstance(value, dict):
            result[key] = _deep_merge(result[key], value)
        else:
            result[key] = value
    return result


def load_config_from_file(path: str, search_paths: Optional[Sequence[str]] = None) -> dict:
    """Load a YAML config file, resolving nested ``config`` includes."""
    resolved = resolve_path(path, search_paths)
    with open(resolved) as f:
        raw = yaml.safe_load(f) or {}
    file_dir = os.path.dirname(os.path.abspath(resolved))
    return _resolve_includes(raw, file_dir)


def _resolve_includes(config: dict, current_dir: Optional[str]) -> dict:
    if not isinstance(config, dict):
        return config
    config = {
        k: _resolve_includes(v, current_dir) if isinstance(v, dict) else v
        for k, v in config.items()
    }
    includes = config.pop("config", None)
    if includes is None:
        return config
    if isinstance(includes, str):
        includes = [includes]
    merged: dict = {}
    search = default_search_paths(current_dir)
    for inc in includes:
        if isinstance(inc, str):
            child = load_config_from_file(inc, search)
        elif isinstance(inc, dict):
            child = _load_namespaced_include(inc, search)
        else:
            raise ValueError(f"Unsupported config include entry: {inc!r}")
        merged = _deep_merge(merged, child)
    # parent's own keys take precedence over included files
    return _deep_merge(merged, config)


def _load_namespaced_include(spec: dict, search_paths: Sequence[str]) -> dict:
    """Load a namespaced include: string leaves are paths, loaded in place."""
    out: dict = {}
    for key, value in spec.items():
        if isinstance(value, str):
            out[key] = load_config_from_file(value, search_paths)
        elif isinstance(value, dict):
            out[key] = _load_namespaced_include(value, search_paths)
        else:
            raise ValueError(
                f"Namespaced include leaves must be paths or dicts, got {value!r}"
            )
    return out


def load_config(
    config: Union[str, dict, None],
    current_dict: Optional[dict] = None,
    search_paths: Optional[Sequence[str]] = None,
) -> dict:
    """Load a config from a path or dict, merged on top of ``current_dict``."""
    base = copy.deepcopy(current_dict) if current_dict else {}
    if config is None:
        return base
    if isinstance(config, str):
        loaded = load_config_from_file(config, search_paths)
    else:
        loaded = _resolve_includes(copy.deepcopy(config), None)
    return _deep_merge(base, loaded)


def _set_dotted(d: dict, dotted_key: str, value) -> None:
    keys = dotted_key.split(".")
    for key in keys[:-1]:
        d = d.setdefault(key, {})
        if not isinstance(d, dict):
            raise ValueError(f"Cannot set nested key {dotted_key}: {key} is not a dict")
    d[keys[-1]] = value


def _parse_value(value: str):
    try:
        parsed = yaml.safe_load(value)
    except yaml.YAMLError:
        return value
    if isinstance(parsed, str):
        # YAML 1.1 floats need a dot before the exponent ("1.0e-4");
        # the common CLI spelling "1e-4" loads as a STRING and then
        # poisons numeric config keys downstream (observed: optax got
        # learning_rate="1e-4" and crashed mid-run).  Accept scientific
        # notation numerically.
        try:
            return float(parsed)
        except ValueError:
            return parsed
    return parsed


def load_config_from_args(
    parser: Optional[argparse.ArgumentParser] = None,
    args: Optional[Sequence[str]] = None,
) -> dict:
    """Parse CLI args into a config dict.

    Supports ``--config file.yaml [file2.yaml ...]`` plus arbitrary
    ``--dotted.key value`` overrides which take top precedence.
    """
    if parser is None:
        parser = argparse.ArgumentParser()
    known, unknown = parser.parse_known_args(args)
    config: dict = {}

    config_files = getattr(known, "config", None)
    if config_files:
        if isinstance(config_files, str):
            config_files = [config_files]
        for cf in config_files:
            config = _deep_merge(config, load_config_from_file(cf))

    # registered (non-config) argparse args merge next
    for key, value in vars(known).items():
        if key == "config" or value is None:
            continue
        _set_dotted(config, key, value)

    # unknown --key value pairs take top precedence
    i = 0
    while i < len(unknown):
        token = unknown[i]
        if token.startswith("--"):
            key = token[2:]
            if "=" in key:
                key, value = key.split("=", 1)
                _set_dotted(config, key, _parse_value(value))
                i += 1
            elif i + 1 < len(unknown) and not unknown[i + 1].startswith("--"):
                _set_dotted(config, key, _parse_value(unknown[i + 1]))
                i += 2
            else:
                _set_dotted(config, key, True)
                i += 1
        else:
            i += 1
    return config


def save_config_to_file(path: str, config: dict) -> None:
    """Write a config dict to a YAML file (for reproducibility)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(_to_plain(config), f, default_flow_style=False, sort_keys=False)


def _to_plain(obj):
    """Convert numpy/jax scalars and arrays to plain Python for YAML dumping."""
    import numpy as np

    if isinstance(obj, dict):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.generic,)):
        return obj.item()
    if hasattr(obj, "item") and not isinstance(obj, (str, bytes, int, float, bool)):
        try:
            return obj.item()
        except Exception:
            return str(obj)
    return obj
