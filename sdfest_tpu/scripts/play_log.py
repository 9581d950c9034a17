"""Play back pipeline optimization logs ("flight recorder").

Capability parity with /root/reference/sdfest/estimation/scripts/
play_log.py: loads the pickled step log written by
:class:`sdfest_tpu.pipeline.SDFPipeline` (``log_path=...``), re-renders the
depth estimate of selected iterations, plots loss/inlier trajectories, and
optionally exports an mp4 animation (matplotlib writer; Open3D-free).

Usage:
  python -m sdfest_tpu.scripts.play_log --log <log.pkl> [--out out.mp4]
        [--stride 1]
"""
from __future__ import annotations

import argparse
import pickle

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def load_log(path: str) -> dict:
    """Load a pipeline step log; returns {"config":..., "log": {...}}."""
    with open(path, "rb") as f:
        return pickle.load(f)


def plot_trajectories(log: dict, out_path: str) -> None:
    """Loss / inlier-ratio / state trajectories over iterations."""
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    axes[0, 0].plot(log["loss"], label="total")
    axes[0, 0].plot(log["loss_depth"], label="depth")
    axes[0, 0].plot(log["loss_pc"], label="pc")
    axes[0, 0].set_yscale("log")
    axes[0, 0].set_title("losses")
    axes[0, 0].legend()
    axes[0, 1].plot(log["inlier_ratio"])
    axes[0, 1].set_title("inlier ratio")
    axes[1, 0].plot(np.asarray(log["position"])[:, 0, :])
    axes[1, 0].set_title("position (x, y, z)")
    axes[1, 1].plot(np.asarray(log["scale"])[:, 0])
    axes[1, 1].set_title("scale")
    for ax in axes.flat:
        ax.set_xlabel("iteration")
    fig.tight_layout()
    fig.savefig(out_path)
    print(f"Trajectory plot saved to {out_path}")


def export_animation(
    data: dict, out_path: str, stride: int = 1, fps: int = 30
) -> None:
    """Re-render logged states into an mp4 depth animation."""
    import jax.numpy as jnp

    from sdfest_tpu.pipeline.pipeline import SDFPipeline

    config = data["config"]
    log = data["log"]
    pipeline = SDFPipeline(config)
    frames = []
    n = len(log["loss"])
    for i in range(0, n, stride):
        depth = pipeline.generate_depth(
            jnp.asarray(log["position"][i][0]),
            jnp.asarray(log["orientation"][i][0]),
            jnp.asarray(log["scale"][i][0]),
            jnp.asarray(log["latent"][i]),
        )
        frames.append(np.asarray(depth))

    from matplotlib import animation

    fig, ax = plt.subplots()
    vmax = max(f.max() for f in frames) or 1.0
    im = ax.imshow(frames[0], vmin=0, vmax=vmax)
    ax.axis("off")

    def update(i):
        im.set_data(frames[i])
        ax.set_title(f"iteration {i * stride}")
        return [im]

    ani = animation.FuncAnimation(fig, update, frames=len(frames))
    try:
        ani.save(out_path, fps=fps)
        print(f"Animation saved to {out_path}")
    except Exception as e:
        fallback = out_path.rsplit(".", 1)[0] + "_frames.npz"
        np.savez_compressed(fallback, frames=np.stack(frames))
        print(f"mp4 export failed ({e}); frames saved to {fallback}")


def main() -> None:
    parser = argparse.ArgumentParser(description="Play back optimization logs.")
    parser.add_argument("--log", required=True)
    parser.add_argument("--out", default=None)
    parser.add_argument("--stride", type=int, default=1)
    args = parser.parse_args()

    data = load_log(args.log)
    plot_trajectories(data["log"], (args.out or args.log) + ".trajectories.png")
    if args.out:
        export_animation(data, args.out, stride=args.stride)


if __name__ == "__main__":
    main()
