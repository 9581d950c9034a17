"""Model weight resolution and loading.

Mirrors the reference convention (/root/reference/sdfest/utils.py:10-43):
configs carry a ``model`` path (searched in ``.``, ``~/.sdfest_tpu/
model_weights/`` and the package dir) and optionally a ``model_url``.
Supported formats:

- ``*.pt``   — reference PyTorch checkpoints, converted on load
  (:mod:`sdfest_tpu.utils.convert_torch`).
- ``*.msgpack`` — native flax-serialized parameter pytrees
  (:func:`save_params` / :func:`load_params`).
- missing   — randomly initialized parameters (training / testing).

Like the reference, weights are auto-downloaded from ``model_url`` when the
resolved path does not exist (/root/reference/sdfest/utils.py:27-39), so a
config fully identifies a runnable model.  Upgrades over the reference: an
optional ``model_sha256`` config key verifies the download, and setting
``SDFEST_TPU_NO_DOWNLOAD=1`` disables network access for air-gapped
deployments (the raised error then explains how to fetch and convert).
"""
from __future__ import annotations

import hashlib
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import serialization

from sdfest_tpu.utils.config import resolve_path


def save_params(path: str, variables: Any) -> None:
    """Serialize a parameter pytree to msgpack."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))


def load_params(path: str, template: Any) -> Any:
    """Deserialize a parameter pytree; ``template`` supplies the structure."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _search_paths():
    return [
        ".",
        # repo root: configs shipping repo-relative weight paths (e.g. the
        # training demo's trained_models/...) resolve from any cwd
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        os.path.expanduser("~/.sdfest_tpu/model_weights/"),
        os.path.expanduser("~/.sdfest/model_weights/"),  # reference weights dir
    ]


def download_weights(url: str, path: str, sha256: Optional[str] = None) -> str:
    """Download model weights to ``path``, verifying an optional checksum.

    TPU-native counterpart of the reference's ``cpas_toolbox.utils.download``
    call (/root/reference/sdfest/utils.py:27-39) with integrity checking the
    reference lacks: a mismatched ``sha256`` removes the file and raises.
    """
    import urllib.request

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    print(f"Model weights {path} not found.\nDownloading from {url}")
    tmp = path + ".part"
    try:
        urllib.request.urlretrieve(url, tmp)
        if sha256 is not None:
            digest = hashlib.sha256()
            with open(tmp, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    digest.update(chunk)
            if digest.hexdigest() != sha256:
                raise IOError(
                    f"Checksum mismatch for {url}: expected {sha256}, "
                    f"got {digest.hexdigest()}"
                )
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return path


def _resolve_model_path(config: Dict[str, Any]) -> Optional[str]:
    model = config.get("model")
    if model is None:
        return None
    resolved = resolve_path(model, _search_paths())
    if os.path.exists(resolved):
        return resolved
    url = config.get("model_url")
    if url and os.environ.get("SDFEST_TPU_NO_DOWNLOAD", "") != "1":
        if not os.path.isabs(resolved):
            resolved = os.path.expanduser(
                os.path.join("~/.sdfest_tpu/model_weights", model)
            )
        return download_weights(url, resolved, config.get("model_sha256"))
    hint = f" Download it from {url} and place it at {model}." if url else ""
    raise FileNotFoundError(
        f"Model weights {model} not found in search paths.{hint} "
        "PyTorch .pt checkpoints from the reference are converted "
        "automatically on load."
    )


def load_vae_params(vae_config: Dict[str, Any], vae, resolution: int):
    """Load (or initialize) VAE parameters for an SDFVAE module."""
    path = _resolve_model_path(vae_config)
    if path is None or not os.path.exists(path):
        variables = vae.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1, resolution, resolution, resolution)),
            jax.random.PRNGKey(1),
        )
        return variables["params"]
    if path.endswith(".pt"):
        from sdfest_tpu.utils.convert_torch import convert_vae_checkpoint

        return jax.tree_util.tree_map(
            jnp.asarray, convert_vae_checkpoint(path, vae_config)
        )
    template = vae.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, resolution, resolution, resolution)),
        jax.random.PRNGKey(1),
    )["params"]
    return load_params(path, template)


def load_init_variables(init_config: Dict[str, Any], net, num_points: int):
    """Load (or initialize) init-network variables (params + batch stats)."""
    template = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, num_points, init_config["backbone"].get("in_size", 3))),
    )
    path = _resolve_model_path(init_config)
    if path is None or not os.path.exists(path):
        return template
    if path.endswith(".pt"):
        from sdfest_tpu.utils.convert_torch import convert_init_checkpoint

        converted = convert_init_checkpoint(path, init_config)
        return {
            "params": jax.tree_util.tree_map(jnp.asarray, converted["params"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray, converted["batch_stats"]
            ),
        }
    return load_params(path, template)
