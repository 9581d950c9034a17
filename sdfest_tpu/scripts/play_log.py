"""Play back pipeline optimization logs ("flight recorder").

Capability parity with /root/reference/sdfest/estimation/scripts/
play_log.py:99-270: loads the pickled step log written by
:class:`sdfest_tpu.pipeline.SDFPipeline` (``log_path=...``), re-renders the
estimate of selected iterations, plots loss/inlier trajectories, exports an
mp4 animation, and exports per-step meshes.  Headless deviations from the
reference (documented in NOTES.md): the Open3D interactive window with
keyboard toggles becomes animation ``--mode`` selection (``depth`` /
``error`` / ``mesh``, the reference's three visualization toggles), and
constant-framerate export is driven by ``--fps`` over iterations instead of
wall-clock step timestamps (the fused scan has no per-step host timestamps).

Usage:
  python -m sdfest_tpu.scripts.play_log --log <log.pkl> [--out out.mp4]
        [--stride 1] [--mode depth|error|mesh] [--export_meshes DIR]
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


def _render_frames(data: dict, stride: int, pipeline=None):
    """Re-render logged states; returns (pipeline, depth frames, indices)."""
    import jax.numpy as jnp

    from sdfest_tpu.pipeline.pipeline import SDFPipeline

    if pipeline is None:
        pipeline = SDFPipeline(data["config"])
    log = data["log"]
    frames, indices = [], []
    for i in range(0, len(log["loss"]), stride):
        depth = pipeline.generate_depth(
            jnp.asarray(log["position"][i][0]),
            jnp.asarray(log["orientation"][i][0]),
            jnp.asarray(log["scale"][i][0]),
            jnp.asarray(log["latent"][i]),
        )
        frames.append(np.asarray(depth))
        indices.append(i)
    return pipeline, frames, indices


def export_animation(
    data: dict,
    out_path: str,
    stride: int = 1,
    fps: int = 30,
    mode: str = "depth",
    pipeline=None,
) -> None:
    """Export an mp4 of the optimization (reference play_log toggles).

    Modes: ``depth`` (estimated depth), ``error`` (|estimate - input| on
    the overlap, requires a log with ``depth_input``), ``mesh`` (normal-
    shaded render of the estimated surface).  Pass ``pipeline`` to reuse an
    already-constructed pipeline (the in-pipeline ``animation_path`` export
    does).
    """
    from sdfest_tpu.ops.sdf_vis import save_depth_animation, shade_depth

    _, frames, indices = _render_frames(data, stride, pipeline=pipeline)
    titles = [f"iteration {i}" for i in indices]
    if mode == "depth":
        save_depth_animation(frames, out_path, fps=fps, titles=titles)
    elif mode == "error":
        if "depth_input" not in data["log"]:
            raise ValueError(
                "error mode needs a log with depth_input (written by "
                "pipelines from this version on)"
            )
        inp = np.asarray(data["log"]["depth_input"])[-1]
        err = [
            np.where((f > 0) & (inp > 0), np.abs(f - inp), 0.0)
            for f in frames
        ]
        save_depth_animation(err, out_path, fps=fps, titles=titles,
                             cmap="inferno")
    elif mode == "mesh":
        shaded = [shade_depth(f) for f in frames]
        save_depth_animation(shaded, out_path, fps=fps, titles=titles,
                             cmap="gray", vmax=1.0)
    else:
        raise ValueError(f"Unknown animation mode {mode}")


def export_meshes(data: dict, out_dir: str, stride: int = 1) -> None:
    """Write per-step extracted meshes (reference play_log's precomputed
    mesh sequence, play_log.py:99-134) as numbered .obj files."""
    import os

    import jax.numpy as jnp

    from sdfest_tpu.pipeline.pipeline import SDFPipeline
    from sdfest_tpu.pipeline.synthetic import save_obj

    pipeline = SDFPipeline(data["config"])
    log = data["log"]
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    for i in range(0, len(log["loss"]), stride):
        mesh = pipeline.generate_mesh(
            jnp.asarray(log["latent"][i]),
            jnp.asarray(log["scale"][i][0]),
            complete_mesh=True,
        )
        if mesh is None:
            continue
        save_obj(
            os.path.join(out_dir, f"{i:05d}.obj"),
            mesh.get_transformed_vertices(),
            mesh.faces,
        )
        count += 1
    print(f"{count} meshes written to {out_dir}")


def main() -> None:
    parser = argparse.ArgumentParser(description="Play back optimization logs.")
    parser.add_argument("--log", required=True)
    parser.add_argument("--out", default=None)
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--fps", type=int, default=30)
    parser.add_argument("--mode", default="depth",
                        choices=("depth", "error", "mesh"))
    parser.add_argument("--export_meshes", metavar="DIR", default=None)
    args = parser.parse_args()

    data = load_log(args.log)
    plot_trajectories(data["log"], (args.out or args.log) + ".trajectories.png")
    if args.out:
        export_animation(data, args.out, stride=args.stride, fps=args.fps,
                         mode=args.mode)
    if args.export_meshes:
        export_meshes(data, args.export_meshes, stride=args.stride)


if __name__ == "__main__":
    main()
