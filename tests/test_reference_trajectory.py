"""Whole-pipeline trajectory parity against the reference's own CPU path.

Runs the reference's ACTUAL refinement loop — the torch ``SDFPipeline``
(/root/reference/sdfest/estimation/simple_setup.py:408-570) driven through
its complete CPU render+autograd path
(differentiable_renderer/sdf_renderer.py:136-264, simple_renderer.py:253) —
and this repo's :class:`sdfest_tpu.pipeline.SDFPipeline` on IDENTICAL
inputs: the same observed depth image (rendered by the reference CPU
renderer), the same converted mug VAE fixture weights
(/root/reference/tests/initilization/vae_model/mug.pt), and the same fixed
starting estimate (the init networks are bypassed on both sides so the
comparison isolates the refinement loop).  Per-iteration total losses and
the final pose must agree within documented floating-point tolerances.

This is the strongest available evidence for BASELINE.md parity config 5
(whole-pipeline trajectory parity): every semantic convention — ray
generation at pixel center 0.5, OBB entry, ``threshold * t`` termination,
trilinear pc loss over observed points, masked depth L1, per-parameter
Adam learning rates, post-step quaternion renormalization — must line up
for the trajectories to stay together over 10 coupled optimization steps.
Measured agreement (2026-08, torch 2.x CPU vs jax 0.9 XLA:CPU): total
loss matches to ~4e-7 relative at every step, final
position/orientation/scale/latent agree to float32 rounding (0.000 mm,
0.000 deg printed at 3 decimals).

The reference imports heavy dependencies that do not exist in this
environment (CUDA toolchain via ``torch.utils.cpp_extension.load`` at
import time, open3d, healpy, trimesh, pyrender, mesh_to_sdf, skimage,
ffmpeg, yoco, cpas_toolbox).  They are stubbed module-by-module below —
none of them participate in the CPU refinement path — and every stub is
removed again at module teardown.  Nothing under /root/reference is
modified.
"""
import os
import pickle
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest
import yaml

REFERENCE_DIR = "/root/reference"
MUG_DIR = os.path.join(REFERENCE_DIR, "tests", "initilization", "vae_model")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MUG_DIR), reason="reference tree unavailable"
)

# shared scene: small raster (the reference CPU renderer is a serial
# per-ray Python loop; 80x60 keeps the 11 renders + derivative images
# under a minute) with the fov-parameterized pinhole the reference CPU
# path supports (simple_renderer.py:222-250: pixel center 0.5,
# fx = fy = width / (2 tan(fov/2)), principal point at the image center)
WIDTH, HEIGHT = 80, 60
FOV_DEG = 70.0
# python float (an np.float64 scalar is strongly typed under jax x64 and
# would promote the whole refinement to float64)
FX = float(WIDTH / (2.0 * np.tan(np.radians(FOV_DEG) / 2.0)))
THRESHOLD = 0.005
N_ITERATIONS = 10

_STUB_NAMES = [
    "ffmpeg",
    "open3d",
    "trimesh",
    "trimesh.visual",
    "trimesh.visual.material",
    "mesh_to_sdf",
    "pyrender",
    "pyrender.constants",
    "skimage",
    "skimage.measure",
    "healpy",
    "yoco",
    "cpas_toolbox",
    "cpas_toolbox.utils",
]


class _AnyAttr:
    """Inert value: any attribute access or call yields another of these.

    The reference touches stubbed packages at import time in type
    annotations (e.g. ``o3d.camera.PinholeCameraParameters()`` in a return
    annotation, sdf_renderer.py:98); none of those objects are ever used
    on the CPU refinement path.
    """

    def __getattr__(self, name):
        return _AnyAttr()

    def __call__(self, *args, **kwargs):
        return _AnyAttr()


def _install_stubs():
    """Insert inert stand-ins for the reference's unused heavy deps."""
    installed = []
    for name in _STUB_NAMES:
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        mod.__sdfest_tpu_test_stub__ = True

        def _module_getattr(attr_name):
            # dunders must fail honestly: inspect.getmodule walks every
            # sys.modules entry and asks for __file__/__path__
            if attr_name.startswith("__"):
                raise AttributeError(attr_name)
            return _AnyAttr()

        mod.__getattr__ = _module_getattr
        sys.modules[name] = mod
        installed.append(name)
    # attributes the reference binds at import time
    sys.modules["trimesh"].Trimesh = type("Trimesh", (), {})
    sys.modules["trimesh"].visual = sys.modules["trimesh.visual"]
    sys.modules["trimesh.visual"].material = sys.modules[
        "trimesh.visual.material"
    ]
    sys.modules["trimesh.visual.material"].SimpleMaterial = type(
        "SimpleMaterial", (), {}
    )
    sys.modules["pyrender"].constants = sys.modules["pyrender.constants"]
    sys.modules["pyrender.constants"].RenderFlags = types.SimpleNamespace(
        SKIP_CULL_FACES=0
    )
    sys.modules["skimage"].measure = sys.modules["skimage.measure"]
    sys.modules["skimage.measure"].marching_cubes = None
    sys.modules["yoco"].resolve_path = lambda path, search_paths=None: (
        os.path.expanduser(path)
    )
    sys.modules["cpas_toolbox"].utils = sys.modules["cpas_toolbox.utils"]

    def _no_download(url, path):  # pragma: no cover - never hit in the test
        raise RuntimeError("download disabled in tests")

    sys.modules["cpas_toolbox.utils"].download = _no_download
    return installed


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    """Import the reference with stubbed heavy deps; yield its handles."""
    torch = pytest.importorskip("torch")
    stubs = _install_stubs()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import torch.utils.cpp_extension as cpp_ext

    orig_load = cpp_ext.load
    # the reference JIT-compiles its CUDA extension at import time
    # (sdf_renderer.py:22-28); the CPU autograd path never touches it
    cpp_ext.load = lambda *a, **k: types.SimpleNamespace()
    # the reference brackets its step log with torch.cuda.synchronize()
    # unconditionally (simple_setup.py:338); a no-op on this CPU-only torch
    orig_sync = torch.cuda.synchronize
    torch.cuda.synchronize = lambda *a, **k: None
    had_np_float = hasattr(np, "float")
    if not had_np_float:
        # numpy >= 1.24 removed the alias; the reference CPU renderer
        # uses it (simple_renderer.py:268-274)
        np.float = float
    try:
        from sdfest.estimation import simple_setup as ref_setup
        from sdfest.differentiable_renderer import sdf_renderer as ref_sdfr
        from sdfest.differentiable_renderer import simple_renderer as ref_simple

        yield {
            "torch": torch,
            "setup": ref_setup,
            "sdf_renderer": ref_sdfr,
            "simple_renderer": ref_simple,
            "tmp": tmp_path_factory.mktemp("ref_traj"),
        }
    finally:
        cpp_ext.load = orig_load
        torch.cuda.synchronize = orig_sync
        if not had_np_float and hasattr(np, "float"):
            del np.float
        for name in stubs:
            sys.modules.pop(name, None)


def _mug_vae_config():
    with open(os.path.join(MUG_DIR, "mug.yaml")) as f:
        return yaml.safe_load(f)


@pytest.fixture(scope="module")
def scene(ref):
    """Shared observation + fixed starting estimate (numpy, both sides)."""
    torch = ref["torch"]
    from sdfest.vae.sdf_vae import SDFVAE

    cfg = _mug_vae_config()
    vae = SDFVAE(
        sdf_size=64,
        latent_size=cfg["latent_size"],
        encoder_dict=cfg["encoder"],
        decoder_dict=cfg["decoder"],
        device=torch.device("cpu"),
    )
    vae.load_state_dict(
        torch.load(os.path.join(MUG_DIR, "mug.pt"), map_location="cpu")
    )
    vae.eval()

    rng = np.random.default_rng(42)
    latent_gt = rng.normal(size=(1, cfg["latent_size"])).astype(np.float32)
    with torch.no_grad():
        sdf_gt = vae.decode(torch.from_numpy(latent_gt))[0, 0].numpy()

    position_gt = np.array([0.02, -0.01, -0.45], dtype=np.float32)
    orientation_gt = np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)
    scale_gt = np.float32(0.12)

    # observed depth from the REFERENCE CPU renderer so both pipelines see
    # the exact same target image
    sdf_object = ref["simple_renderer"].SDFObject(sdf_gt)
    depth, _ = ref["simple_renderer"].render_depth(
        sdf_object,
        WIDTH,
        HEIGHT,
        FOV_DEG,
        "d",
        THRESHOLD,
        position_gt,
        orientation_gt,
        1.0 / scale_gt,
    )
    depth = depth.astype(np.float32)
    assert (depth > 0).sum() > 200, "GT render should cover a real pixel set"

    # fixed starting estimate: perturbed pose + perturbed latent
    q = np.array([0.06, -0.04, 0.05, 1.0], dtype=np.float32)
    q /= np.linalg.norm(q)
    start = {
        "latent": (latent_gt + 0.15 * rng.normal(size=latent_gt.shape)).astype(
            np.float32
        ),
        "position": (position_gt + np.array([0.015, -0.01, 0.02])).astype(
            np.float32
        )[None],
        "scale": np.array([scale_gt * 1.12], dtype=np.float32),
        "orientation": q[None],
    }
    return {
        "vae_config": cfg,
        "depth": depth,
        "mask": depth > 0,
        "start": start,
    }


def _run_reference(ref, scene):
    """Drive the reference SDFPipeline.__call__ on its CPU render path."""
    torch = ref["torch"]
    setup = ref["setup"]
    tmp = ref["tmp"]

    # the reference constructs + loads the init network unconditionally;
    # give it a tiny quaternion-head net with weights saved to disk (it is
    # bypassed below -- trajectory parity isolates the refinement loop)
    from sdfest.initialization.sdf_pose_network import SDFPoseNet, SDFPoseHead
    from sdfest.initialization.pointnet import VanillaPointNet

    backbone_cfg = {"in_size": 3, "mlp_out_sizes": [8, 16], "batchnorm": False}
    head_cfg = {
        "in_size": 16,
        "mlp_out_sizes": [8],
        "batchnorm": False,
        "orientation_repr": "quaternion",
    }
    torch.manual_seed(0)
    net = SDFPoseNet(
        VanillaPointNet(**backbone_cfg),
        SDFPoseHead(
            shape_dimension=scene["vae_config"]["latent_size"], **head_cfg
        ),
    )
    init_weights = str(tmp / "init_stub.pt")
    torch.save(net.state_dict(), init_weights)

    vae_cfg = dict(scene["vae_config"])
    vae_cfg["model"] = os.path.join(MUG_DIR, "mug.pt")
    config = {
        "device": "cpu",
        "camera": {
            "width": WIDTH,
            "height": HEIGHT,
            "fx": FX,
            "fy": FX,
            "cx": WIDTH / 2.0,
            "cy": HEIGHT / 2.0,
            "pixel_center": 0.5,
        },
        "threshold": THRESHOLD,
        "max_iterations": N_ITERATIONS,
        "depth_weight": 1.0,
        "pc_weight": 3.0,
        "nn_weight": 0.0,
        "far_field": None,
        "init_view": "first",
        "result_selection_strategy": "last_iteration",
        "init": {
            "model": init_weights,
            "backbone_type": "VanillaPointNet",
            "backbone": backbone_cfg,
            "head_type": "SDFPoseHead",
            "head": head_cfg,
        },
        "vae": vae_cfg,
    }
    pipe = setup.SDFPipeline(config)

    # CPU render path: same signature as the GPU closure it replaces
    # (simple_setup.py:84-86), camera expressed as width+height+fov (the
    # only parameterization the CPU autograd function supports)
    pipe.render = lambda sdf, pos, quat, i_s: ref["sdf_renderer"].render_depth(
        sdf, pos, quat, i_s, WIDTH, HEIGHT, FOV_DEG, THRESHOLD, None
    )

    start = scene["start"]
    fixed = tuple(
        torch.from_numpy(np.array(start[k]))
        for k in ("latent", "position", "scale", "orientation")
    )
    pipe._nn_init = lambda *a, **k: tuple(t.clone() for t in fixed)

    # record the trajectory through the loop's own hooks: the total loss
    # via _compute_gradients (called pre-backward each iteration), the
    # post-step pose via _update_best_estimate (called post-renorm each
    # iteration) -- the reference's log_path writer deepcopies non-leaf
    # tensors (copy.deepcopy of 1/scale, simple_setup.py:598-607), which
    # modern torch rejects, so it cannot be used here
    losses = []
    trajectory = []
    orig_backward = setup.SDFPipeline._compute_gradients
    orig_update = pipe._update_best_estimate

    def record(loss):
        losses.append(float(loss.detach()))
        orig_backward(loss)

    def record_update(depth_input, depth_estimate, position, orientation,
                      scale, latent_shape):
        trajectory.append(
            {
                "position": position.detach().numpy().copy()[0],
                "orientation": orientation.detach().numpy().copy()[0],
                "scale": float(scale.detach().numpy()[0]),
            }
        )
        return orig_update(
            depth_input, depth_estimate, position, orientation, scale,
            latent_shape,
        )

    pipe._compute_gradients = record
    pipe._update_best_estimate = record_update

    depth_t = torch.from_numpy(scene["depth"].copy())
    mask_t = torch.from_numpy(scene["mask"].copy())
    color_t = torch.zeros(HEIGHT, WIDTH, 3)
    position, orientation, scale, latent = pipe(depth_t, mask_t, color_t)
    return {
        "losses": np.asarray(losses, dtype=np.float64),
        "trajectory": trajectory,
        "position": position.detach().numpy()[0],
        "orientation": orientation.detach().numpy()[0],
        "scale": float(scale.detach().numpy()[0]),
        "latent": latent.detach().numpy()[0],
    }


def _run_ours(scene, tmp_path):
    from sdfest_tpu.pipeline import SDFPipeline

    vae_cfg = dict(scene["vae_config"])
    vae_cfg["model"] = os.path.join(MUG_DIR, "mug.pt")
    config = {
        "camera": {
            "width": WIDTH,
            "height": HEIGHT,
            "fx": FX,
            "fy": FX,
            "cx": WIDTH / 2.0,
            "cy": HEIGHT / 2.0,
            "pixel_center": 0.5,
        },
        "threshold": THRESHOLD,
        "max_iterations": N_ITERATIONS,
        "depth_weight": 1.0,
        "pc_weight": 3.0,
        "nn_weight": 0.0,
        "init_view": "first",
        "result_selection_strategy": "last_iteration",
        "renderer_backend": "xla",
        "init": {
            "model": None,
            "backbone_type": "VanillaPointNet",
            "backbone": {
                "in_size": 3,
                "mlp_out_sizes": [8, 16],
                "batchnorm": False,
            },
            "head": {
                "in_size": 16,
                "mlp_out_sizes": [8],
                "batchnorm": False,
                "orientation_repr": "quaternion",
            },
        },
        "vae": vae_cfg,
    }
    pipeline = SDFPipeline(config)
    start = scene["start"]
    fixed = tuple(
        jnp.asarray(start[k])
        for k in ("latent", "position", "scale", "orientation")
    )
    # pin the start state on BOTH call paths: the legacy path consults
    # the _nn_init host wrapper, the fused single-dispatch path traces
    # _nn_init_views directly (returning the extra validity scalar)
    pipeline._nn_init = lambda *a, **k: fixed
    pipeline._nn_init_views = lambda *a, **k: fixed + (jnp.asarray(True),)

    log_path = str(tmp_path / "our_log.pkl")
    position, orientation, scale, latent = pipeline(
        jnp.asarray(scene["depth"]),
        jnp.asarray(scene["mask"]),
        log_path=log_path,
    )
    with open(log_path, "rb") as f:
        log = pickle.load(f)
    return {
        "losses": np.asarray(log["log"]["loss"], dtype=np.float64),
        "position": np.asarray(position)[0],
        "orientation": np.asarray(orientation)[0],
        "scale": float(np.asarray(scale)[0]),
        "latent": np.asarray(latent)[0],
        "log": log,
    }


def test_refinement_trajectory_matches_reference_cpu(ref, scene, tmp_path):
    got_ref = _run_reference(ref, scene)
    got_ours = _run_ours(scene, tmp_path)

    assert got_ref["losses"].shape == (N_ITERATIONS,)
    assert got_ours["losses"].shape == (N_ITERATIONS,)

    rel = np.abs(got_ours["losses"] - got_ref["losses"]) / got_ref["losses"]
    print("reference losses:", got_ref["losses"])
    print("our losses      :", got_ours["losses"])
    print("per-step rel dev:", rel)

    # measured agreement is ~4e-7 relative at EVERY step (the two
    # implementations produce the same hit set and the same f32-rounded
    # depths at this raster, so the coupled trajectories stay together to
    # float32 rounding); 1e-4 leaves ~250x headroom for platform variance
    assert np.all(rel < 1e-4), f"trajectory diverged: {rel}"
    # both descend
    assert got_ref["losses"][-1] < got_ref["losses"][0]
    assert got_ours["losses"][-1] < got_ours["losses"][0]

    dp = np.linalg.norm(got_ours["position"] - got_ref["position"])
    dq = 2.0 * np.degrees(
        np.arccos(
            np.clip(
                abs(np.dot(got_ours["orientation"], got_ref["orientation"])),
                -1.0,
                1.0,
            )
        )
    )
    ds = abs(got_ours["scale"] - got_ref["scale"]) / got_ref["scale"]
    dl = np.max(np.abs(got_ours["latent"] - got_ref["latent"]))
    print(
        f"final deltas: |dpos|={dp*1000:.3f} mm, angle={dq:.3f} deg, "
        f"scale rel={ds:.5f}, latent max={dl:.5f}"
    )
    # measured: 0.000 mm / 0.000 deg / 0.0 / 0.0 (f32-rounding identical);
    # bounds leave large headroom for platform variance while still
    # asserting sub-voxel, sub-degree agreement
    assert dp < 1e-4, f"final position deviates {dp*1000:.3f} mm"
    assert dq < 0.05, f"final orientation deviates {dq:.4f} deg"
    assert ds < 1e-3, f"final scale deviates {ds:.5f}"
    assert dl < 1e-3, f"final latent deviates {dl:.5f}"

    # per-step pose trajectory (captured post-step on both sides)
    ours_pos = np.asarray(got_ours["log"]["log"]["position"])[:, 0]
    ref_pos = np.stack([t["position"] for t in got_ref["trajectory"]])
    step_dev = np.linalg.norm(ours_pos - ref_pos, axis=-1)
    print("per-step |dposition| (mm):", step_dev * 1000)
    assert np.all(step_dev < 1e-4)
