"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU).

The XLA gather-based implementations are the oracle; the Pallas MXU
factorization must agree everywhere including the clamped extrapolation
region.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from sdfest_tpu.ops.camera import Camera
from sdfest_tpu.ops.interpolation import sample_sdf
from sdfest_tpu.render import api
from sdfest_tpu.render.pallas_kernel import (
    render_depth_pallas_fwd,
    sample_sdf_grad_pallas,
    sample_sdf_pallas,
    scatter_sdf_grad_pallas,
)
from sdfest_tpu.render.xla import render_depth as render_depth_xla

from conftest import make_sphere_sdf

SDF = jnp.asarray(make_sphere_sdf(64, radius=0.5))
CAM = Camera(width=64, height=48, fx=32, fy=32, cx=32, cy=24, pixel_center=0.5)
POSITION = jnp.asarray([0.03, -0.01, -0.55], dtype=jnp.float32)
QUAT = jnp.asarray(
    Rotation.from_euler("XYZ", [15, 30, -10], degrees=True).as_quat(),
    dtype=jnp.float32,
)
INV_SCALE = jnp.asarray(1.0 / 0.18, dtype=jnp.float32)


@pytest.mark.parametrize("span", [0.95, 1.25])
def test_sample_parity(span):
    pts = jax.random.uniform(
        jax.random.PRNGKey(0), (1000, 3), minval=-span, maxval=span,
        dtype=jnp.float32,
    )
    got = sample_sdf_pallas(SDF, pts)
    want = sample_sdf(SDF, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_sample_grad_parity():
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (300, 3), minval=-1.1, maxval=1.1,
        dtype=jnp.float32,
    )
    value, grad = sample_sdf_grad_pallas(SDF, pts)
    want_value = sample_sdf(SDF, pts)
    np.testing.assert_allclose(np.asarray(value), np.asarray(want_value), atol=1e-4)
    grad_fn = jax.vmap(jax.grad(lambda p: sample_sdf(SDF, p[None])[0]))
    want_grad = grad_fn(pts)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want_grad), atol=1e-3)


def test_sample_mask_zeroes_rows():
    pts = jax.random.uniform(jax.random.PRNGKey(2), (300, 3), dtype=jnp.float32)
    mask = (jnp.arange(300) % 3 == 0).astype(jnp.float32)
    value, grad = sample_sdf_grad_pallas(SDF, pts, mask)
    assert bool(jnp.all(value[mask == 0] == 0))
    assert bool(jnp.all(grad[mask == 0] == 0))


def test_scatter_parity():
    pts = jax.random.uniform(
        jax.random.PRNGKey(3), (1000, 3), minval=-1.1, maxval=1.1,
        dtype=jnp.float32,
    )
    cot = jax.random.normal(jax.random.PRNGKey(4), (1000,), dtype=jnp.float32)
    got = scatter_sdf_grad_pallas(pts, cot)
    _, vjp = jax.vjp(lambda s: sample_sdf(s, pts), SDF)
    (want,) = vjp(cot)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_march_parity_with_xla():
    depth_pl = render_depth_pallas_fwd(
        SDF, POSITION, QUAT, INV_SCALE, CAM, threshold=0.005
    )
    depth_xla = render_depth_xla(
        SDF, POSITION, QUAT, INV_SCALE, camera=CAM, threshold=0.005
    )
    pl_np, xla_np = np.asarray(depth_pl), np.asarray(depth_xla)
    assert (pl_np > 0).sum() > 50
    agree = ((pl_np > 0) == (xla_np > 0)).mean()
    assert agree > 0.995
    both = (pl_np > 0) & (xla_np > 0)
    assert np.abs(pl_np[both] - xla_np[both]).max() < 5e-3


def test_api_render_pallas_gradients_match_xla():
    """Custom VJP of the pallas path == the XLA path's analytic gradients."""
    target = render_depth_xla(
        SDF, POSITION, QUAT, INV_SCALE, camera=CAM, threshold=0.005
    )

    def loss(render_fn, p, q, i, s):
        est = render_fn(s, p, q, i)
        m = ((est > 0) & (target > 0)).astype(est.dtype)
        return jnp.sum(jnp.abs(est - target) * m)

    render_xla = lambda s, p, q, i: render_depth_xla(
        s, p, q, i, camera=CAM, threshold=0.005
    )
    # culling=False: this test checks VJP exactness, which needs the pallas
    # forward to take exactly the plain march's steps (culling's stepping
    # noise at silhouettes is covered by the march parity test)
    render_pl = lambda s, p, q, i: api.render_depth(
        s, p, q, i, camera=CAM, threshold=0.005, backend="pallas",
        culling=False,
    )
    args = (POSITION + 0.01, QUAT, INV_SCALE, SDF)
    g_xla = jax.grad(lambda p, q, i, s: loss(render_xla, p, q, i, s),
                     argnums=(0, 1, 2, 3))(*args)
    g_pl = jax.grad(lambda p, q, i, s: loss(render_pl, p, q, i, s),
                    argnums=(0, 1, 2, 3))(*args)
    labels = ["position", "quaternion", "inv_scale", "sdf"]
    for label, a, b in zip(labels, g_xla, g_pl):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2,
                                   err_msg=f"gradient mismatch for {label}")


def test_pc_loss_pallas_backend_matches_xla():
    from sdfest_tpu.pipeline.losses import pc_loss

    points = jax.random.uniform(
        jax.random.PRNGKey(5), (500, 3), minval=-0.3, maxval=0.3,
        dtype=jnp.float32,
    ) + jnp.asarray([0.0, 0.0, -0.5])
    scale = jnp.asarray(0.2, dtype=jnp.float32)
    v_xla = pc_loss(points, POSITION, QUAT, scale, SDF, backend="xla")
    v_pl = pc_loss(points, POSITION, QUAT, scale, SDF, backend="pallas")
    np.testing.assert_allclose(np.asarray(v_pl), np.asarray(v_xla), atol=1e-4)

    def total(fn_backend, p):
        return jnp.sum(
            jnp.abs(pc_loss(points, p, QUAT, scale, SDF, backend=fn_backend))
        )

    g_xla = jax.grad(lambda p: total("xla", p))(POSITION)
    g_pl = jax.grad(lambda p: total("pallas", p))(POSITION)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_xla), rtol=1e-3,
                               atol=1e-4)

def test_coarse_culling_bound_and_parity():
    """Coarse min-pool lower-bounds the interpolant; culled march matches."""
    from sdfest_tpu.render.pallas_kernel import NC, coarse_min_table
    from sdfest_tpu.ops.interpolation import sample_sdf

    rng = np.random.default_rng(3)
    rough = jnp.asarray(rng.standard_normal((64, 64, 64)).astype(np.float32))
    # low-pass to get surface-like smoothness while keeping variation
    k = jnp.ones((5, 5, 5)) / 125.0
    smooth = jax.scipy.signal.convolve(rough, k, mode="same") * 10.0
    ttc = coarse_min_table(smooth)  # (NC^2, 2*NC): [min | max-abs] blocks
    c_grid = jnp.transpose(ttc[:, :NC], (1, 0)).reshape(NC, NC, NC)
    a_grid = jnp.transpose(ttc[:, NC:], (1, 0)).reshape(NC, NC, NC)
    pts = jnp.asarray(
        rng.uniform(-1 - 1e-6, 1 + 1e-6, (20000, 3)).astype(np.float32)
    )
    values = sample_sdf(smooth, pts)
    ci = jnp.clip(jnp.floor((pts + 1) * NC / 2), 0, NC - 1).astype(int)
    bound = c_grid[ci[:, 0], ci[:, 1], ci[:, 2]]
    assert float(jnp.min(values - bound)) >= 0.0
    # max-abs block upper-bounds |interpolant| (bf16 error scale)
    amax = a_grid[ci[:, 0], ci[:, 1], ci[:, 2]]
    assert float(jnp.max(jnp.abs(values) - amax)) <= 0.0

    d_plain = render_depth_pallas_fwd(
        SDF, POSITION, QUAT, INV_SCALE, CAM, threshold=0.005, culling=False
    )
    d_cull = render_depth_pallas_fwd(
        SDF, POSITION, QUAT, INV_SCALE, CAM, threshold=0.005, culling=True
    )
    a, b = np.asarray(d_plain), np.asarray(d_cull)
    assert ((a > 0) == (b > 0)).mean() > 0.995
    both = (a > 0) & (b > 0)
    assert np.abs(a[both] - b[both]).max() < 5e-3


def test_pallas_render_under_vmap_and_grad():
    """Hypothesis batching: vmap (and vmap-of-grad) over the pallas path.

    The pallas_call batching rule adds a leading grid dimension (per-program
    while loops, no cross-hypothesis lock-step); refine_batch relies on it.
    """
    ps = jnp.tile(POSITION, (3, 1)) + 1e-3 * jnp.arange(3)[:, None]
    qs = jnp.tile(QUAT, (3, 1))
    iss = jnp.full((3,), float(INV_SCALE))
    single = render_depth_pallas_fwd(
        SDF, ps[1], qs[1], iss[1], CAM, threshold=0.005
    )
    batched = jax.vmap(
        lambda p, q, i: render_depth_pallas_fwd(
            SDF, p, q, i, CAM, threshold=0.005
        )
    )(ps, qs, iss)
    assert batched.shape == (3,) + single.shape
    a, b = np.asarray(single), np.asarray(batched[1])
    assert ((a > 0) == (b > 0)).all()  # identical hit mask
    np.testing.assert_allclose(b, a, atol=1e-6)  # fusion-level fp noise

    def loss(p, q, i):
        return jnp.sum(
            api.render_depth(
                SDF, p, q, i, camera=CAM, threshold=0.005, backend="pallas"
            )
        )

    grads = jax.vmap(jax.grad(loss))(ps, qs, iss)
    assert grads.shape == (3, 3)
    assert bool(jnp.all(jnp.isfinite(grads)))


def test_compaction_all_inactive_and_skip():
    """Active-tile compaction: skipped tiles produce zeros, not garbage."""
    # object fully behind the camera: zero active tiles
    behind = jnp.asarray([0.0, 0.0, 0.6], dtype=jnp.float32)
    d = render_depth_pallas_fwd(SDF, behind, QUAT, INV_SCALE, CAM,
                                threshold=0.005)
    assert bool(jnp.all(jnp.isfinite(d))) and float(jnp.abs(d).sum()) == 0.0
    # aux variant with every ray skipped (temporal-coherence input)
    skip = jnp.ones((CAM.height, CAM.width), dtype=jnp.float32)
    d2, aux = render_depth_pallas_fwd(
        SDF, POSITION, QUAT, INV_SCALE, CAM, threshold=0.005, aux=True,
        skip=skip,
    )
    assert float(jnp.abs(d2).sum()) == 0.0
    for v in aux.values():
        assert bool(jnp.all(jnp.isfinite(v)))
    # skipped rays keep their start distance in the corridor outputs
    np.testing.assert_allclose(np.asarray(aux["t"]), np.asarray(aux["t0"]))


def test_tile_order_pointcloud_is_permutation():
    """order="tile" is a pure permutation of the raster point rows."""
    from sdfest_tpu.ops import pointset

    depth = render_depth_xla(
        SDF, POSITION, QUAT, INV_SCALE, camera=CAM, threshold=0.005
    )
    p_r, m_r = pointset.depth_to_pointcloud_dense(depth, CAM)
    p_t, m_t = pointset.depth_to_pointcloud_dense(depth, CAM, order="tile")
    assert int(m_r.sum()) == int(m_t.sum())
    got = np.asarray(p_t[m_t])
    want = np.asarray(p_r[m_r])
    got_sorted = got[np.lexsort(got.T)]
    want_sorted = want[np.lexsort(want.T)]
    np.testing.assert_allclose(got_sorted, want_sorted)


def test_windowed_sampler_coherent_and_scattered():
    """Window fast path (coherent tiles) == fallback path (scattered)."""
    key = jax.random.PRNGKey(7)
    # coherent: all points inside a narrow y-slab -> windowed branch
    base = jax.random.uniform(key, (512, 3), minval=-0.9, maxval=0.9,
                              dtype=jnp.float32)
    coherent = base.at[:, 1].set(0.1 + 0.05 * base[:, 1])
    got = sample_sdf_pallas(SDF, coherent)
    want = sample_sdf(SDF, coherent)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    # scattered: same points shuffled across tiles -> fallback branch
    perm = jax.random.permutation(jax.random.PRNGKey(8), 512)
    got_s = sample_sdf_pallas(SDF, base[perm])
    want_s = sample_sdf(SDF, base[perm])
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), atol=1e-4)
    # gradients through both regimes
    for pts in (coherent, base):
        _, grad = sample_sdf_grad_pallas(SDF, pts)
        want_grad = jax.vmap(jax.grad(lambda p: sample_sdf(SDF, p[None])[0]))(pts)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(want_grad),
                                   atol=1e-3)
        cot = jnp.ones((pts.shape[0],), jnp.float32)
        got_sc = scatter_sdf_grad_pallas(pts, cot)
        _, vjp = jax.vjp(lambda s: sample_sdf(s, pts), SDF)
        (want_sc,) = vjp(cot)
        np.testing.assert_allclose(np.asarray(got_sc), np.asarray(want_sc),
                                   atol=1e-3)


def test_fused_render_pc_matches_separate_path():
    """render_depth_with_pc_values == render_depth + pc_loss, incl. grads.

    The fused op's joint backward (one sample-grad + one scatter over the
    concatenated surrogate + pc query sets) must reproduce the separate
    custom-VJP instances to fp rounding.
    """
    from sdfest_tpu.ops import pointset
    from sdfest_tpu.pipeline import losses as L
    from sdfest_tpu.render import render_depth, render_depth_with_pc_values

    scale = 1.0 / INV_SCALE
    target = render_depth(SDF, POSITION, QUAT, INV_SCALE, camera=CAM,
                          threshold=0.005, backend="pallas")
    points, pmask = pointset.depth_to_pointcloud_dense(target, CAM,
                                                       order="tile")
    p = (POSITION + jnp.asarray([0.02, -0.01, 0.015])).astype(jnp.float32)
    q = (QUAT + jnp.asarray([0.03, 0.0, -0.02, 0.0])).astype(jnp.float32)
    s = (scale * 1.07).astype(jnp.float32)

    def loss_sep(sdf, p, q, s):
        est = render_depth(sdf, p, q, 1.0 / s, camera=CAM, threshold=0.005,
                           backend="pallas")
        return (L.depth_l1_loss(target, est)
                + 3.0 * L.masked_pc_loss(points, pmask, p, q, s, sdf)), est

    def loss_fused(sdf, p, q, s):
        est, vals = render_depth_with_pc_values(
            sdf, p, q, s, points, pmask, camera=CAM, threshold=0.005,
            backend="pallas")
        return (L.depth_l1_loss(target, est)
                + 3.0 * L.masked_mean_abs(vals, pmask)), est

    sdf32 = SDF.astype(jnp.float32)
    (l1, e1), g1 = jax.value_and_grad(loss_sep, argnums=(0, 1, 2, 3),
                                      has_aux=True)(sdf32, p, q, s)
    (l2, e2), g2 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3),
                                      has_aux=True)(sdf32, p, q, s)
    assert bool(jnp.all(e1 == e2))  # identical forward renders
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        # two scatters vs one concatenated scatter accumulate in different
        # orders; tolerance is 1e-4 of the gradient magnitude
        np.testing.assert_allclose(a, b, rtol=5e-4,
                                   atol=1e-4 * max(np.abs(a).max(), 1e-6))


def test_window_bounds_cover_span_when_ok():
    """Centered window starts still cover the active span whenever ok.

    _window_bounds/_zwindow_bounds center the WJ/WZ-cell window on the
    active span (sub-step drift headroom); this property test pins the
    coverage invariant the march's valid predicates rely on: ok implies
    every active cell c satisfies j0 <= c <= j0 + W - 2, the start is
    in-range, and the z start is _ZSHIFT-aligned.
    """
    import numpy as np
    from sdfest_tpu.render import pallas_kernel as pk

    rng = np.random.default_rng(0)
    res = 64
    for trial in range(200):
        q = 256
        # cells come from _base_frac, which clamps bases to [0, res - 2];
        # the coverage invariant relies on that (cell res - 1 at the top
        # clip boundary would escape the window by one)
        span = int(rng.integers(1, 40))
        lo = int(rng.integers(0, res - 2 - span + 1))
        byi = jnp.asarray(
            rng.integers(lo, lo + span + 1, size=(q, 1)), jnp.int32
        )
        act = jnp.asarray(rng.random((q, 1)) < 0.3)
        if not bool(act.any()):
            continue
        cells = np.asarray(byi)[np.asarray(act)]
        j0, ok = jax.jit(pk._window_bounds, static_argnums=2)(byi, act, res)
        j0, ok = int(j0), bool(ok)
        assert ok == (cells.max() - cells.min() <= pk.WJ - 2)
        assert 0 <= j0 <= res - pk.WJ
        if ok:
            assert j0 <= cells.min() and cells.max() <= j0 + pk.WJ - 2
        k0, kok = jax.jit(pk._zwindow_bounds, static_argnums=2)(byi, act, res)
        k0, kok = int(k0), bool(kok)
        assert 0 <= k0 <= res - pk.WZ and k0 % pk._ZSHIFT == 0
        if kok:
            assert k0 <= cells.min() and cells.max() <= k0 + pk.WZ - 2
        else:
            # not-ok only when the aligned window genuinely cannot cover
            assert cells.max() - k0 > pk.WZ - 2


def test_roi_render_equals_full_crop():
    """ROI rendering == the same crop of a full-frame render, exactly.

    Rays are pixel-independent, and the ROI path feeds the kernel dynamic
    slices of the same direction planes, so the equality is bitwise — the
    property the pipeline's ROI depth loss relies on.  Also checks the
    gradient path runs (fused render+pc with roi).
    """
    from sdfest_tpu.ops.camera import Camera
    from sdfest_tpu.render.api import render_depth

    cam = Camera(width=96, height=64, fx=48, fy=48, cx=48, cy=32,
                 pixel_center=0.5)
    sdf = jnp.asarray(make_sphere_sdf(64))
    p = jnp.asarray([0.02, -0.01, -0.5], jnp.float32)
    q = jnp.asarray([0.2, 0.1, 0.0, 0.97], jnp.float32)
    q = q / jnp.linalg.norm(q)
    for off in ((0, 0), (16, 32), (32, 48)):
        off_a = jnp.asarray(off, jnp.int32)
        full = render_depth(sdf, p, q, jnp.asarray(5.0), camera=cam,
                            threshold=0.005, backend="pallas")
        roi = render_depth(sdf, p, q, jnp.asarray(5.0), camera=cam,
                           threshold=0.005, backend="pallas",
                           roi=(32, 48), roi_offset=off_a)
        np.testing.assert_array_equal(
            np.asarray(roi),
            np.asarray(full)[off[0]:off[0] + 32, off[1]:off[1] + 48],
        )

    def loss(pp):
        d = render_depth(sdf, pp, q, jnp.asarray(5.0), camera=cam,
                         threshold=0.005, backend="pallas",
                         roi=(32, 48), roi_offset=jnp.asarray([16, 24]))
        return jnp.sum(d)

    g = jax.grad(loss)(p)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_masked_sample_gradients_scale_mask_once():
    """Non-binary masks: pallas point/sdf gradients match the xla backend.

    Regression for a double-masking bug: the grad kernel already returns
    grad * m, and the VJP multiplied by cot * m again (m^2 point-gradient
    scaling vs the xla backend's single m)."""
    from sdfest_tpu.render.api import sample_sdf_masked_extrapolating

    pts = jax.random.uniform(
        jax.random.PRNGKey(3), (512, 3), minval=-1.1, maxval=1.1
    ).astype(jnp.float32)
    mask = jnp.full((512,), 0.5, jnp.float32)

    def loss(backend):
        return lambda s, p: jnp.sum(
            jnp.sin(3.0 * sample_sdf_masked_extrapolating(
                s, p, mask, backend=backend
            ))
        )

    v_pl = loss("pallas")(SDF, pts)
    v_xla = loss("xla")(SDF, pts)
    np.testing.assert_allclose(float(v_pl), float(v_xla), rtol=1e-5)
    gs_pl, gp_pl = jax.grad(loss("pallas"), argnums=(0, 1))(SDF, pts)
    gs_xla, gp_xla = jax.grad(loss("xla"), argnums=(0, 1))(SDF, pts)
    np.testing.assert_allclose(np.asarray(gp_pl), np.asarray(gp_xla),
                               atol=1e-5)
    # scatter accumulation order differs between backends: fp noise only
    np.testing.assert_allclose(np.asarray(gs_pl), np.asarray(gs_xla),
                               atol=5e-5)


def test_fused_points_gradient_matches_separate_path():
    """The fused op propagates real gradients to the observed points."""
    from sdfest_tpu.pipeline import losses as L
    from sdfest_tpu.render.api import render_depth_with_pc_values

    depth = render_depth_pallas_fwd(
        SDF, POSITION, QUAT, INV_SCALE, CAM, threshold=0.005
    )
    from sdfest_tpu.ops import pointset

    points, pmask = pointset.depth_to_pointcloud_dense(
        depth, CAM, order="tile"
    )
    scale = 1.0 / INV_SCALE

    def fused(pts):
        _, vals = render_depth_with_pc_values(
            SDF, POSITION, QUAT, scale, pts, pmask, camera=CAM,
            threshold=0.005, backend="pallas",
        )
        return L.masked_mean_abs(vals, pmask)

    def separate(pts):
        vals = L.pc_loss(pts, POSITION, QUAT, scale, SDF, pmask,
                         backend="xla")
        return L.masked_mean_abs(vals, pmask)

    g_fused = jax.grad(fused)(points)
    g_sep = jax.grad(separate)(points)
    assert float(jnp.abs(g_fused).max()) > 0.0  # regression: was all-zero
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_sep),
                               atol=2e-4)


def test_unaligned_roi_stays_on_pallas_full_frame_crop():
    """A TILE-unaligned ROI must not demote the render to the xla march:
    the kernel renders the full frame and the API crops — bitwise equal to
    cropping a full render."""
    from sdfest_tpu.render.api import _kernel_roi, _pallas_capable, render_depth

    assert _pallas_capable(SDF, CAM)
    assert _kernel_roi((16, 32)) == (16, 32)
    assert _kernel_roi((15, 30)) is None
    off = jnp.asarray([7, 9], jnp.int32)
    full = render_depth(SDF, POSITION, QUAT, INV_SCALE, camera=CAM,
                        threshold=0.005, backend="pallas")
    crop = render_depth(SDF, POSITION, QUAT, INV_SCALE, camera=CAM,
                        threshold=0.005, backend="pallas", roi=(15, 30),
                        roi_offset=off)
    np.testing.assert_array_equal(
        np.asarray(full)[7:22, 9:39], np.asarray(crop)
    )


def test_unaligned_raster_aligned_roi_stays_on_kernel():
    """A TILE-aligned ROI keeps a TILE-unaligned raster on the kernel path.

    Enables e.g. ``camera.strided(4)`` coarse phases (640x480 -> 160x120,
    120 % 16 != 0) as long as the refinement window is aligned.  Ray
    directions depend only on pixel indices + intrinsics, so a camera with
    extra rows/cols shares the rays of the overlapping region: the ROI
    render on the unaligned 48x56 raster must be bitwise equal to the same
    ROI on the aligned 48x64 superset raster.
    """
    from sdfest_tpu.render.api import _pallas_capable, render_depth

    cam_u = Camera(width=56, height=48, fx=32, fy=32, cx=32, cy=24,
                   pixel_center=0.5)
    assert not _pallas_capable(SDF, cam_u)
    assert _pallas_capable(SDF, cam_u, kernel_roi=(16, 32))
    off = jnp.asarray([16, 16], jnp.int32)
    got = render_depth(SDF, POSITION, QUAT, INV_SCALE, camera=cam_u,
                       threshold=0.005, backend="pallas", roi=(16, 32),
                       roi_offset=off)
    want = render_depth(SDF, POSITION, QUAT, INV_SCALE, camera=CAM,
                        threshold=0.005, backend="pallas", roi=(16, 32),
                        roi_offset=off)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # fused render+pc gradients flow through the new path
    pts = jax.random.uniform(jax.random.PRNGKey(2), (256, 3),
                             minval=-0.2, maxval=0.2,
                             dtype=jnp.float32) + POSITION
    pmask = jnp.ones((256,), jnp.float32)

    def loss(pp):
        d, v = api.render_depth_with_pc_values(
            SDF, pp, QUAT, 1.0 / INV_SCALE, pts, pmask, camera=cam_u,
            threshold=0.005, backend="pallas", roi=(16, 32), roi_offset=off,
        )
        return jnp.sum(d) + jnp.sum(v)

    g = jax.grad(loss)(POSITION)
    assert bool(jnp.all(jnp.isfinite(g)))

    # without an aligned ROI the unaligned raster falls back to the xla
    # march (same values as calling the xla backend directly)
    fb = render_depth(SDF, POSITION, QUAT, INV_SCALE, camera=cam_u,
                      threshold=0.005, backend="pallas")
    want_fb = render_depth(SDF, POSITION, QUAT, INV_SCALE, camera=cam_u,
                           threshold=0.005, backend="xla")
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(want_fb))
