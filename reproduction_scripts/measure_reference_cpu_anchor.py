"""Measure the reference implementation's refinement rate on its CPU path.

BASELINE.md's 50 it/s anchor for the reference is an estimate derived from
the reference's code structure (its repo publishes no numbers and no CUDA
device exists in this environment).  This script puts a MEASURED point
under that anchor: it times the reference's actual refinement loop
(/root/reference/sdfest/estimation/simple_setup.py:408-570) driven through
its complete CPU render+autograd path
(differentiable_renderer/sdf_renderer.py:136-264, simple_renderer.py:253)
at a reduced raster, and times this repo's pipeline on the same scene for
a same-machine comparison.  Setup costs cancel via two runs at different
iteration counts: s/iter = (t(N_hi) - t(N_lo)) / (N_hi - N_lo).

The stub machinery for the reference's unused heavy imports is shared in
spirit with tests/test_reference_trajectory.py (kept self-contained here
because reproduction scripts must run without the test tree).

Usage (from the repository root):
    python reproduction_scripts/measure_reference_cpu_anchor.py
"""
import os
import sys
import time
import types

import numpy as np

REFERENCE_DIR = "/root/reference"
MUG_DIR = os.path.join(REFERENCE_DIR, "tests", "initilization", "vae_model")

WIDTH, HEIGHT = 80, 60
FOV_DEG = 70.0
FX = float(WIDTH / (2.0 * np.tan(np.radians(FOV_DEG) / 2.0)))
THRESHOLD = 0.005
N_LO, N_HI = 2, 32
# our per-iteration cost is ~100x smaller, so the differential needs a
# much wider gap plus min-of-repeats to rise above host timing noise
N_LO_OURS, N_HI_OURS, REPEATS_OURS = 5, 105, 5

_STUB_NAMES = [
    "ffmpeg", "open3d", "trimesh", "trimesh.visual",
    "trimesh.visual.material", "mesh_to_sdf", "pyrender",
    "pyrender.constants", "skimage", "skimage.measure", "healpy", "yoco",
    "cpas_toolbox", "cpas_toolbox.utils",
]


class _AnyAttr:
    def __getattr__(self, name):
        return _AnyAttr()

    def __call__(self, *args, **kwargs):
        return _AnyAttr()


def _install_stubs():
    for name in _STUB_NAMES:
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)

        def _module_getattr(attr_name):
            if attr_name.startswith("__"):
                raise AttributeError(attr_name)
            return _AnyAttr()

        mod.__getattr__ = _module_getattr
        sys.modules[name] = mod
    sys.modules["yoco"].resolve_path = (
        lambda path, search_paths=None: os.path.expanduser(path)
    )


def _scene_and_configs():
    import yaml

    with open(os.path.join(MUG_DIR, "mug.yaml")) as f:
        vae_cfg = yaml.safe_load(f)
    vae_cfg["model"] = os.path.join(MUG_DIR, "mug.pt")
    camera = {
        "width": WIDTH, "height": HEIGHT, "fx": FX, "fy": FX,
        "cx": WIDTH / 2.0, "cy": HEIGHT / 2.0, "pixel_center": 0.5,
    }
    backbone_cfg = {"in_size": 3, "mlp_out_sizes": [8, 16],
                    "batchnorm": False}
    head_cfg = {"in_size": 16, "mlp_out_sizes": [8], "batchnorm": False,
                "orientation_repr": "quaternion"}
    base = {
        "camera": camera,
        "threshold": THRESHOLD,
        "depth_weight": 1.0,
        "pc_weight": 3.0,
        "nn_weight": 0.0,
        "init_view": "first",
        "result_selection_strategy": "last_iteration",
        "vae": vae_cfg,
        "init": {
            "backbone_type": "VanillaPointNet",
            "backbone": backbone_cfg,
            "head_type": "SDFPoseHead",
            "head": head_cfg,
        },
    }
    return base


def measure_reference(base_cfg, start, depth, mask):
    import torch
    import torch.utils.cpp_extension as cpp_ext

    cpp_ext.load = lambda *a, **k: types.SimpleNamespace()
    torch.cuda.synchronize = lambda *a, **k: None
    if not hasattr(np, "float"):
        np.float = float
    sys.path.insert(0, REFERENCE_DIR)
    from sdfest.estimation import simple_setup as setup
    from sdfest.differentiable_renderer import sdf_renderer as sdfr
    from sdfest.initialization.sdf_pose_network import (
        SDFPoseNet, SDFPoseHead,
    )
    from sdfest.initialization.pointnet import VanillaPointNet

    # init network weights (bypassed; the constructor loads them)
    torch.manual_seed(0)
    net = SDFPoseNet(
        VanillaPointNet(**base_cfg["init"]["backbone"]),
        SDFPoseHead(shape_dimension=base_cfg["vae"]["latent_size"],
                    **base_cfg["init"]["head"]),
    )
    init_weights = "/tmp/ref_anchor_init_stub.pt"
    torch.save(net.state_dict(), init_weights)

    # silence the CPU renderer's per-call timing prints
    import builtins

    real_print = builtins.print

    def run(n_iters):
        cfg = dict(base_cfg)
        cfg["device"] = "cpu"
        cfg["far_field"] = None
        cfg["max_iterations"] = n_iters
        cfg["init"] = dict(cfg["init"], model=init_weights)
        pipe = setup.SDFPipeline(cfg)
        pipe.render = lambda sdf, pos, quat, i_s: sdfr.render_depth(
            sdf, pos, quat, i_s, WIDTH, HEIGHT, FOV_DEG, THRESHOLD, None
        )
        fixed = tuple(
            torch.from_numpy(np.array(start[k]))
            for k in ("latent", "position", "scale", "orientation")
        )
        pipe._nn_init = lambda *a, **k: tuple(t.clone() for t in fixed)
        depth_t = torch.from_numpy(depth.copy())
        mask_t = torch.from_numpy(mask.copy())
        color_t = torch.zeros(HEIGHT, WIDTH, 3)
        builtins.print = lambda *a, **k: None
        t0 = time.perf_counter()
        pipe(depth_t, mask_t, color_t)
        dt = time.perf_counter() - t0
        builtins.print = real_print
        return dt

    # per-endpoint min-of-3, then ONE differential: the classic noise-
    # robust timing estimator (min() of a set of differentials is biased
    # low and can go negative when per-endpoint noise exceeds the
    # iteration cost — observed on the first version of this script).
    # Using each endpoint's best case keeps the estimate conservative
    # for any speedup claimed over the reference.
    t_lo = min(run(N_LO) for _ in range(3))
    t_hi = min(run(N_HI) for _ in range(3))
    real_print(
        f"[reference raw] t({N_LO} iters) = {t_lo:.2f} s (min of 3), "
        f"t({N_HI} iters) = {t_hi:.2f} s (min of 3)"
    )
    return (t_hi - t_lo) / (N_HI - N_LO)


def measure_ours(base_cfg, start, depth, mask):
    import jax

    # the container's sitecustomize forces the TPU platform and OVERRIDES
    # the JAX_PLATFORMS env var; this is a same-machine CPU comparison
    # (and must not contend with TPU jobs), so force CPU here
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sdfest_tpu.pipeline import SDFPipeline

    def run(n_iters):
        cfg = dict(base_cfg)
        cfg["max_iterations"] = n_iters
        cfg["init"] = dict(cfg["init"], model=None)
        pipe = SDFPipeline(cfg)
        fixed = tuple(
            jnp.asarray(start[k])
            for k in ("latent", "position", "scale", "orientation")
        )
        pipe._nn_init = lambda *a, **k: fixed
        d, m = jnp.asarray(depth), jnp.asarray(mask)
        pipe(d, m)  # compile
        best = float("inf")
        for _ in range(REPEATS_OURS):
            t0 = time.perf_counter()
            out = pipe(d, m)
            [x.block_until_ready() for x in out]
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = run(N_LO_OURS)
    t_hi = run(N_HI_OURS)
    return (t_hi - t_lo) / (N_HI_OURS - N_LO_OURS)


def main():
    _install_stubs()
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    base_cfg = _scene_and_configs()

    # shared scene: GT depth from the reference CPU renderer
    import torch
    import torch.utils.cpp_extension as cpp_ext

    cpp_ext.load = lambda *a, **k: types.SimpleNamespace()
    if not hasattr(np, "float"):
        np.float = float
    sys.path.insert(0, REFERENCE_DIR)
    from sdfest.vae.sdf_vae import SDFVAE
    from sdfest.differentiable_renderer import simple_renderer

    cfg = base_cfg["vae"]
    vae = SDFVAE(sdf_size=64, latent_size=cfg["latent_size"],
                 encoder_dict=cfg["encoder"], decoder_dict=cfg["decoder"],
                 device=torch.device("cpu"))
    vae.load_state_dict(torch.load(cfg["model"], map_location="cpu"))
    vae.eval()
    rng = np.random.default_rng(42)
    latent_gt = rng.normal(size=(1, cfg["latent_size"])).astype(np.float32)
    with torch.no_grad():
        sdf_gt = vae.decode(torch.from_numpy(latent_gt))[0, 0].numpy()
    position_gt = np.array([0.02, -0.01, -0.45], dtype=np.float32)
    orientation_gt = np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)
    scale_gt = np.float32(0.12)
    depth, _ = simple_renderer.render_depth(
        simple_renderer.SDFObject(sdf_gt), WIDTH, HEIGHT, FOV_DEG, "d",
        THRESHOLD, position_gt, orientation_gt, 1.0 / scale_gt,
    )
    depth = depth.astype(np.float32)
    mask = depth > 0
    q = np.array([0.06, -0.04, 0.05, 1.0], dtype=np.float32)
    q /= np.linalg.norm(q)
    start = {
        "latent": (latent_gt
                   + 0.15 * rng.normal(size=latent_gt.shape)).astype(
                       np.float32),
        "position": (position_gt
                     + np.array([0.015, -0.01, 0.02],
                                dtype=np.float32))[None],
        "scale": np.array([scale_gt * 1.12], dtype=np.float32),
        "orientation": q[None],
    }

    s_ref = measure_reference(base_cfg, start, depth, mask)
    s_ours = measure_ours(base_cfg, start, depth, mask)

    rays = WIDTH * HEIGHT
    rays_full = 640 * 480
    scale_factor = rays_full / rays  # serial CPU path: ~linear in rays
    print("\n=== reference CPU refinement (measured, this machine) ===")
    print(f"raster {WIDTH}x{HEIGHT}, {N_HI - N_LO} differential iterations")
    print(f"reference CPU path: {s_ref:.3f} s/iter = {1.0 / s_ref:.3f} it/s")
    print(
        f"extrapolated to 640x480 (x{scale_factor:.0f} rays, serial "
        f"per-ray): {s_ref * scale_factor:.1f} s/iter = "
        f"{1.0 / (s_ref * scale_factor):.4f} it/s"
    )
    print(
        f"this repo, same scene/machine (XLA:CPU): {s_ours * 1000:.1f} "
        f"ms/iter = {1.0 / s_ours:.1f} it/s "
        f"({s_ref / s_ours:.0f}x the reference CPU path at equal raster)"
    )


if __name__ == "__main__":
    main()
