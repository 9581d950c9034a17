"""Latent-space exploration for trained shape VAEs (headless).

Capability counterpart of the reference's Qt ``visualizer`` GUI
(/root/reference/sdfest/vae/scripts/visualizer.py) for environments without
a display: per-dimension latent sweeps, interpolation between two encoded
shapes, and mesh/SDF/figure export — driven from the command line.

Usage:
  python -m sdfest_tpu.scripts.latent_explorer --config <vae.yaml> \
      --out_folder out [--sweep_dim 0] [--interpolate a.npy b.npy] [--steps 7]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from sdfest_tpu.models.vae import create_vae_from_config
from sdfest_tpu.ops import sdf_vis
from sdfest_tpu.ops.sdf_utils import mesh_from_sdf
from sdfest_tpu.pipeline.synthetic import save_obj
from sdfest_tpu.utils import weights as weight_utils
from sdfest_tpu.utils.config import load_config_from_args


class LatentExplorer:
    """Decode/inspect the latent space of a trained SDF VAE."""

    def __init__(self, config: dict):
        self.config = config
        self.vae = create_vae_from_config(config)
        self.res = config.get("sdf_size", 64)
        self.params = weight_utils.load_vae_params(config, self.vae, self.res)
        self._decode = jax.jit(
            lambda z: self.vae.apply(
                {"params": self.params}, z, method=self.vae.decode
            )
        )

    def decode(self, z: np.ndarray) -> np.ndarray:
        return np.asarray(self._decode(jnp.asarray(z)))

    def encode(self, sdf: np.ndarray) -> np.ndarray:
        means, _ = self.vae.apply(
            {"params": self.params},
            jnp.asarray(sdf)[None, None],
            method=self.vae.encode_mean,
        )
        return np.asarray(means)[0]

    def sweep(self, dim: int, values: np.ndarray, base: np.ndarray = None):
        """Decode a sweep over one latent dimension; returns (len(values), D^3)."""
        latent_size = self.config["latent_size"]
        base = np.zeros(latent_size) if base is None else base
        zs = np.tile(base, (len(values), 1))
        zs[:, dim] = values
        return self.decode(zs)[:, 0]

    def interpolate(self, sdf_a: np.ndarray, sdf_b: np.ndarray, steps: int):
        """Latent interpolation between two encoded shapes."""
        za, zb = self.encode(sdf_a), self.encode(sdf_b)
        ts = np.linspace(0.0, 1.0, steps)
        zs = np.stack([(1 - t) * za + t * zb for t in ts])
        return self.decode(zs)[:, 0]


def main() -> None:
    parser = argparse.ArgumentParser(description="Explore a VAE latent space.")
    parser.add_argument("--config", nargs="+", required=False)
    parser.add_argument("--out_folder", default="latent_explorer_out")
    parser.add_argument("--sweep_dim", type=int, default=None)
    parser.add_argument("--sweep_range", type=float, default=2.0)
    parser.add_argument("--interpolate", nargs=2, default=None)
    parser.add_argument("--steps", type=int, default=7)
    parser.add_argument("--export_mesh", action="store_true")
    config = load_config_from_args(parser)
    args, _ = parser.parse_known_args()

    explorer = LatentExplorer(config)
    os.makedirs(args.out_folder, exist_ok=True)

    if args.sweep_dim is not None:
        values = np.linspace(-args.sweep_range, args.sweep_range, args.steps)
        sdfs = explorer.sweep(args.sweep_dim, values)
        fig = sdf_vis.visualize_sdf_batch(sdfs, max_cols=args.steps)
        path = os.path.join(args.out_folder, f"sweep_dim{args.sweep_dim}.png")
        fig.savefig(path)
        print(f"Sweep figure saved to {path}")
        if args.export_mesh:
            for i, sdf in enumerate(sdfs):
                mesh = mesh_from_sdf(sdf, 0.0, complete_mesh=True)
                if mesh is not None:
                    save_obj(
                        os.path.join(args.out_folder, f"sweep_{i}.obj"),
                        mesh.vertices, mesh.faces,
                    )

    if args.interpolate is not None:
        sdf_a = np.load(args.interpolate[0])
        sdf_b = np.load(args.interpolate[1])
        sdfs = explorer.interpolate(sdf_a, sdf_b, args.steps)
        fig = sdf_vis.visualize_sdf_batch(sdfs, max_cols=args.steps)
        path = os.path.join(args.out_folder, "interpolation.png")
        fig.savefig(path)
        print(f"Interpolation figure saved to {path}")
        np.save(os.path.join(args.out_folder, "interpolation_sdfs.npy"), sdfs)


if __name__ == "__main__":
    main()
