"""Convert reference PyTorch checkpoints to this framework's parameter pytrees.

Supports the released SDFEst artifacts (``{category}_vae.pt`` /
``{category}_init.pt``; see /root/reference/sdfest/utils.py:10-43 for the
reference's weight-loading convention) so users of the reference can carry
their trained models over.  Torch is only needed at conversion time and is
imported lazily; converted weights are plain numpy pytrees that can be saved
with orbax.

Layout mapping:
- ``torch.nn.Linear.weight`` (out, in) -> flax ``Dense.kernel`` (in, out).
- ``torch.nn.Conv3d.weight`` (out, in, kD, kH, kW) -> flax ``Conv.kernel``
  (kD, kH, kW, in, out).
- BatchNorm running stats map to (mean, var) batch_stats collections.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state and not hasattr(
        state["model"], "keys"
    ):
        raise ValueError(f"Unrecognized checkpoint format in {path}")
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _dense(sd, prefix):
    return {
        "kernel": sd[f"{prefix}.weight"].T.copy(),
        "bias": sd[f"{prefix}.bias"].copy(),
    }


def _conv3d(sd, prefix):
    return {
        "kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 4, 1, 0)).copy(),
        "bias": sd[f"{prefix}.bias"].copy(),
    }


def convert_vae_state_dict(sd: Dict[str, np.ndarray], vae_config: dict) -> dict:
    """Convert a reference SDFVAE state dict to flax params for our SDFVAE."""
    params: Dict[str, Any] = {"encoder": {}, "decoder": {}}
    for i, layer_info in enumerate(vae_config["encoder"]["layer_infos"]):
        t = layer_info["type"].split(".")[-1].lower()
        if t == "conv3d":
            params["encoder"][f"features_{i}"] = _conv3d(sd, f"encoder._features.{i}")
        elif t == "linear":
            params["encoder"][f"features_{i}"] = _dense(sd, f"encoder._features.{i}")
    params["encoder"]["linear_means"] = _dense(sd, "encoder.linear_means")
    params["encoder"]["linear_log_var"] = _dense(sd, "encoder.linear_log_var")
    for i in range(len(vae_config["decoder"]["fc_layers"])):
        params["decoder"][f"fc_{i}"] = _dense(sd, f"decoder._fc_layers.{i}")
    for i in range(len(vae_config["decoder"]["conv_layers"])):
        params["decoder"][f"conv_{i}"] = _conv3d(sd, f"decoder._conv_layers.{i}")
    return params


def convert_vae_checkpoint(path: str, vae_config: dict) -> dict:
    """Load and convert a reference ``*_vae.pt`` checkpoint."""
    return convert_vae_state_dict(_load_state_dict(path), vae_config)


def convert_init_state_dict(
    sd: Dict[str, np.ndarray], init_config: dict
) -> Dict[str, Any]:
    """Convert a reference SDFPoseNet state dict to flax params + batch stats.

    Returns a dict with ``params`` and ``batch_stats`` collections matching
    :class:`sdfest_tpu.models.pose_net.SDFPoseNet`.
    """
    params: Dict[str, Any] = {"backbone": {}, "head": {}}
    stats: Dict[str, Any] = {"backbone": {}, "head": {}}

    def convert_pointnet(prefix: str, pdst: dict, sdst: dict) -> None:
        i = 0
        while f"{prefix}._linear_layers.{i}.weight" in sd:
            pdst[f"linear_{i}"] = _dense(sd, f"{prefix}._linear_layers.{i}")
            if f"{prefix}._bn_layers.{i}.weight" in sd:
                pdst[f"bn_{i}"] = {
                    "scale": sd[f"{prefix}._bn_layers.{i}.weight"].copy(),
                    "bias": sd[f"{prefix}._bn_layers.{i}.bias"].copy(),
                }
                sdst[f"bn_{i}"] = {
                    "mean": sd[f"{prefix}._bn_layers.{i}.running_mean"].copy(),
                    "var": sd[f"{prefix}._bn_layers.{i}.running_var"].copy(),
                }
            i += 1

    backbone_type = init_config.get("backbone_type", "VanillaPointNet")
    if backbone_type == "VanillaPointNet":
        convert_pointnet("_backbone", params["backbone"], stats["backbone"])
    elif backbone_type == "IterativePointNet":
        for sub in ("pointnet_1", "pointnet_2"):
            params["backbone"][sub] = {}
            stats["backbone"][sub] = {}
            convert_pointnet(
                f"_backbone.{sub}", params["backbone"][sub], stats["backbone"][sub]
            )
    else:
        raise NotImplementedError(f"Conversion for {backbone_type} not implemented.")

    convert_pointnet("_head", params["head"], stats["head"])
    params["head"]["final"] = _dense(sd, "_head._final_layer")
    return {"params": params, "batch_stats": stats}


def convert_init_checkpoint(path: str, init_config: dict) -> Dict[str, Any]:
    """Load and convert a reference ``*_init.pt`` checkpoint."""
    return convert_init_state_dict(_load_state_dict(path), init_config)
