"""Compiled-Mosaic parity tests (skipped off-TPU).

The regular suite runs the Pallas kernels in interpret mode on CPU; this
module runs the COMPILED kernels against the same oracles when a real TPU
is attached (mirrors the reference's GPU-conditional tests,
tests/initilization/test_generated_dataset.py:32-34).

Run manually on a TPU host: python -m pytest tests/test_tpu_compiled.py -q
(do NOT set the CPU-forcing env of conftest.py -- this module manages the
platform itself).
"""
import numpy as np
import pytest

import jax

if jax.default_backend() != "tpu":
    pytest.skip(
        "compiled-kernel parity needs a TPU (CPU runs use interpret mode)",
        allow_module_level=True,
    )

import jax.numpy as jnp

from sdfest_tpu.ops.camera import Camera
from sdfest_tpu.ops.interpolation import sample_sdf
from sdfest_tpu.render.pallas_kernel import (
    render_depth_pallas_fwd,
    sample_sdf_grad_pallas,
    sample_sdf_pallas,
    scatter_sdf_grad_pallas,
)
from sdfest_tpu.render.xla import render_depth as render_depth_xla


def _sphere(res=64, radius=0.5):
    c = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    return jnp.asarray(
        (np.sqrt(x * x + y * y + z * z) - radius).astype(np.float32)
    )


SDF = _sphere()
CAM = Camera(width=64, height=48, fx=32, fy=32, cx=32, cy=24, pixel_center=0.5)
POS = jnp.asarray([0.03, -0.01, -0.55], jnp.float32)
QUAT = jnp.asarray([0.121, 0.045, -0.09, 0.988], jnp.float32)
QUAT = QUAT / jnp.linalg.norm(QUAT)
INV_S = jnp.asarray(1.0 / 0.18, jnp.float32)


def test_compiled_march_matches_xla():
    depth = render_depth_pallas_fwd(
        SDF, POS, QUAT, INV_S, CAM, threshold=0.005, interpret=False
    )
    want = render_depth_xla(
        SDF, POS, QUAT, INV_S, camera=CAM, threshold=0.005
    )
    d, w = np.asarray(depth), np.asarray(want)
    assert (d > 0).sum() > 50
    assert ((d > 0) == (w > 0)).mean() > 0.995
    both = (d > 0) & (w > 0)
    assert np.abs(d[both] - w[both]).max() < 5e-3


def test_compiled_march_plain_one_step_tolerance():
    """Compiled plain march vs XLA oracle: identical masks, depths within
    one termination band.

    In interpret mode the plain path matches the XLA renderer to ~4e-7;
    compiled on the MXU the fp32 contractions run as bf16 passes, whose
    tiny value differences flip individual termination tests near the
    ``dist < threshold * t`` band — shifting those depths by up to one
    final step (~threshold * t ~ 2.8 mm here; measured p50 1.0 mm,
    max 4.6 mm).  The hit mask must still agree exactly.
    """
    depth = render_depth_pallas_fwd(
        SDF, POS, QUAT, INV_S, CAM, threshold=0.005,
        culling=False, bf16=False, interpret=False,
    )
    want = render_depth_xla(
        SDF, POS, QUAT, INV_S, camera=CAM, threshold=0.005
    )
    d, w = np.asarray(depth), np.asarray(want)
    assert ((d > 0) == (w > 0)).all()
    both = (d > 0) & (w > 0)
    assert np.abs(d[both] - w[both]).max() < 6e-3


def test_compiled_samplers_match_oracle():
    pts = jax.random.uniform(
        jax.random.PRNGKey(0), (700, 3), minval=-1.1, maxval=1.1,
        dtype=jnp.float32,
    )
    got = sample_sdf_pallas(SDF, pts, interpret=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(sample_sdf(SDF, pts)), atol=1e-4
    )
    value, grad = sample_sdf_grad_pallas(SDF, pts, interpret=False)
    want_grad = jax.vmap(jax.grad(lambda p: sample_sdf(SDF, p[None])[0]))(pts)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want_grad),
                               atol=1e-3)
    cot = jax.random.normal(jax.random.PRNGKey(1), (700,), dtype=jnp.float32)
    got_sc = scatter_sdf_grad_pallas(pts, cot, interpret=False)
    _, vjp = jax.vjp(lambda s: sample_sdf(s, pts), SDF)
    (want_sc,) = vjp(cot)
    np.testing.assert_allclose(np.asarray(got_sc), np.asarray(want_sc),
                               atol=1e-3)


def test_compiled_all_miss_and_grads_finite():
    behind = jnp.asarray([0.0, 0.0, 0.6], jnp.float32)
    d = render_depth_pallas_fwd(
        SDF, behind, QUAT, INV_S, CAM, threshold=0.005, interpret=False
    )
    assert float(jnp.abs(d).sum()) == 0.0

    from sdfest_tpu.render import api

    g = jax.grad(
        lambda p: jnp.sum(
            api.render_depth(SDF, p, QUAT, INV_S, camera=CAM,
                             threshold=0.005, backend="pallas")
        )
    )(POS)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_compiled_fused_render_pc_grads_match_separate():
    """Fused render+pc op vs separate path, compiled on the real MXU."""
    from sdfest_tpu.ops import pointset
    from sdfest_tpu.pipeline import losses as L
    from sdfest_tpu.render import render_depth, render_depth_with_pc_values
    from sdfest_tpu.utils.scenes import make_mug_sdf

    mug = jnp.asarray(make_mug_sdf(64))
    scale = 1.0 / INV_S
    target = render_depth(mug, POS, QUAT, INV_S, camera=CAM, threshold=0.005,
                          backend="pallas")
    points, pmask = pointset.depth_to_pointcloud_dense(target, CAM,
                                                       order="tile")
    p = POS + jnp.asarray([0.02, -0.01, 0.015], jnp.float32)

    def loss_sep(p):
        est = render_depth(mug, p, QUAT, INV_S, camera=CAM, threshold=0.005,
                           backend="pallas")
        return (L.depth_l1_loss(target, est)
                + 3.0 * L.masked_pc_loss(points, pmask, p, QUAT, scale, mug))

    def loss_fused(p):
        est, vals = render_depth_with_pc_values(
            mug, p, QUAT, scale, points, pmask, camera=CAM, threshold=0.005,
            backend="pallas")
        return (L.depth_l1_loss(target, est)
                + 3.0 * L.masked_mean_abs(vals, pmask))

    l1, g1 = jax.value_and_grad(loss_sep)(p)
    l2, g2 = jax.value_and_grad(loss_fused)(p)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3,
                               atol=1e-4 * float(jnp.abs(g1).max()))


def test_compiled_render_under_vmap():
    """Batched (vmap) compiled render == per-element renders, near-exactly.

    Guards the sequential-vmap rule (pallas_kernel._sequential_vmap):
    letting Mosaic batch-compile the march kernel (vmap adds a leading grid
    dimension) produced WRONG depths on real TPU — 3% of pixels off by up
    to 0.5 with dynamic grids (truncated/misassigned tiles) and with the
    adaptive-relaxation while carries even after reverting to static grids
    — while every interpret-mode and unbatched compile is correct.  The
    production refine_batch path vmaps exactly this call.  With the
    sequential rule the batched program runs the same unbatched kernel per
    element, so the comparison must be tight.  See NOTES.md.
    """
    ps = POS + 0.02 * jax.random.normal(jax.random.PRNGKey(3), (3, 3))
    batched = jax.jit(
        jax.vmap(
            lambda p: render_depth_pallas_fwd(
                SDF, p, QUAT, INV_S, CAM, threshold=0.005, interpret=False
            )
        )
    )(ps.astype(jnp.float32))
    singles = [
        render_depth_pallas_fwd(
            SDF, p, QUAT, INV_S, CAM, threshold=0.005, interpret=False
        )
        for p in ps.astype(jnp.float32)
    ]
    for b, s in zip(batched, singles):
        np.testing.assert_allclose(np.asarray(b), np.asarray(s), atol=1e-5)


def test_compiled_sampler_vjp_under_vmap():
    """Batched sample/scatter custom-VJP path == per-element, compiled."""
    from sdfest_tpu.render import api

    pts = jax.random.uniform(
        jax.random.PRNGKey(7), (4, 512, 3), minval=-1.0, maxval=1.0,
        dtype=jnp.float32,
    )

    def f(sdf, p):
        mask = jnp.ones(p.shape[0], jnp.float32)
        return jnp.sum(
            api.sample_sdf_masked_extrapolating(sdf, p, mask,
                                                backend="pallas") ** 2
        )

    g_batched = jax.jit(jax.vmap(jax.grad(f), in_axes=(None, 0)))(SDF, pts)
    for i in range(pts.shape[0]):
        g1 = jax.jit(jax.grad(f))(SDF, pts[i])
        np.testing.assert_allclose(
            np.asarray(g_batched[i]), np.asarray(g1), atol=1e-5
        )


def test_compiled_sample_grad_under_vmap():
    """Batched fused value+spatial-grad kernel == per-element, compiled.

    Regression guard for the scoped-VMEM class of failure: the grad
    kernel's three (QG, res^2) A-matrices plus the fine + zwin tables
    exceed Mosaic's default 16 MiB scoped-vmem cap under the
    sequential-vmap lax.map wrapper (caught by bench.py's
    batched-hypothesis stage; fixed with CompilerParams.vmem_limit_bytes).
    """
    pts = jax.random.uniform(
        jax.random.PRNGKey(11), (3, 640, 3), minval=-1.1, maxval=1.1,
        dtype=jnp.float32,
    )
    v_b, g_b = jax.jit(jax.vmap(sample_sdf_grad_pallas, in_axes=(None, 0)))(
        SDF, pts
    )
    for i in range(pts.shape[0]):
        v1, g1 = jax.jit(sample_sdf_grad_pallas)(SDF, pts[i])
        np.testing.assert_allclose(np.asarray(v_b[i]), np.asarray(v1),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_b[i]), np.asarray(g1),
                                   atol=1e-6)


def test_compiled_roi_render_equals_full_crop():
    """Compiled-Mosaic ROI render == the same crop of a full render.

    The interpret-mode pin lives in tests/test_pallas.py
    (test_roi_render_equals_full_crop); this guards the compiled path
    against the batched-Mosaic class of divergence (the ROI path slices
    the camera-constant direction planes with traced offsets).
    """
    roi = (16, 32)
    off = jnp.asarray([16, 16], jnp.int32)
    full = jax.jit(
        lambda: render_depth_pallas_fwd(
            SDF, POS, QUAT, INV_S, CAM, threshold=0.005, interpret=False
        )
    )()
    crop = jax.jit(
        lambda o: render_depth_pallas_fwd(
            SDF, POS, QUAT, INV_S, CAM, threshold=0.005, interpret=False,
            roi=roi, roi_offset=o,
        )
    )(off)
    np.testing.assert_allclose(
        np.asarray(full)[16:32, 16:48], np.asarray(crop), atol=1e-6
    )
