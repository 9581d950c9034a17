"""Benchmark: differentiable depth rendering + refinement throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: production refinement throughput (fused render + losses +
analytic VJP + Adam, the SDFPipeline hot loop) on the MUG scene — the
silhouette-graze-heavy regime that dominates real workloads (easy convex
scenes are reported as secondary detail).  ``vs_baseline`` is the multiple
over the documented estimate of the reference CUDA/torch implementation's
refinement rate on its contemporary GPU (BASELINE.md "Reference anchor":
10-30 ms/iteration from the reference's own hot-loop structure; midpoint
20 ms/iter = 50 it/s).  The same-device XLA-oracle speedup (what the kernel
design buys over generic XLA on identical hardware) is in the detail dict.

Timing methodology: the runtime executes lazily and caches bitwise-identical
requests, so every measurement scans over DISTINCT random poses inside one
jitted program (per-call cost = program time / #poses) and repeats with
perturbed pose sets.  Fixed-point "chained" probes are NOT sufficient.
"""
import argparse
import json
import sys

# documented external anchor (BASELINE.md "Reference anchor"): estimated
# reference refinement rate on its contemporary GPU, midpoint of the
# 33-100 it/s range derived from the reference hot-loop structure
REF_EST_ITERS_PER_SEC = 50.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="small sizes (CI)")
    parser.add_argument("--poses", type=int, default=16)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--refine-iters", type=int, default=50)
    parser.add_argument("--hypotheses", type=int, default=8,
                        help="batched-hypothesis refinement width (0 = skip)")
    args = parser.parse_args()

    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    # persistent compilation cache: cold-tunnel Mosaic/XLA compiles dominate
    # a first bench run (~2-4 min per scan program); cached executables make
    # driver re-runs start warm.  Harmless no-op if the backend does not
    # support executable serialization.
    try:
        import os as _os

        import sdfest_tpu as _pkg

        # repo root from the package location, NOT __file__: the latter
        # points elsewhere when bench.py runs through exec()/runpy
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(
                _os.path.dirname(_os.path.dirname(_os.path.abspath(_pkg.__file__))),
                ".jax_cache",
            ),
        )
    except Exception:
        pass

    # the tunneled TPU backend can be transiently UNAVAILABLE while the
    # server drains a wedged compile (measured: an orphaned big-program
    # compile blocked backend init for 1h+); retry init a few times before
    # giving up so a transient wedge doesn't zero out the benchmark
    for attempt in range(5):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if attempt == 4:
                raise
            print(f"backend init failed ({e}); retrying in 120 s",
                  file=sys.stderr)
            time.sleep(120)

    from sdfest_tpu.ops.camera import Camera
    from sdfest_tpu.ops import pointset, quaternion
    from sdfest_tpu.pipeline import losses as L
    from sdfest_tpu.render import (
        render_depth,
        render_depth_with_pc_values,
        resolve_backend,
    )
    from sdfest_tpu.utils.scenes import make_mug_sdf, make_sphere_sdf

    if args.quick:
        camera = Camera(width=160, height=112, fx=80, fy=80, cx=80, cy=56,
                        pixel_center=0.5)
        args.poses, args.reps, args.refine_iters = 4, 1, 5
    else:
        camera = Camera(width=640, height=480, fx=320, fy=320, cx=320, cy=240,
                        pixel_center=0.5)

    block = jax.block_until_ready
    mug = jnp.asarray(make_mug_sdf(64))
    sphere = jnp.asarray(make_sphere_sdf(64))
    true_p = jnp.asarray([0.02, -0.01, -0.5])
    q0 = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    backend = resolve_backend("auto")

    # random realistic pose set (object visible, ~20-45% of tiles active)
    m = args.poses
    ps = true_p + 0.05 * jax.random.normal(jax.random.PRNGKey(0), (m, 3))
    qs = quaternion.random_uniform(jax.random.PRNGKey(1), (m,))
    scales = 0.2 + 0.02 * jax.random.normal(jax.random.PRNGKey(2), (m,))

    def render(sdf, bk):
        return lambda p, q, s: render_depth(
            sdf, p, q, 1.0 / s, camera=camera, threshold=0.005, backend=bk
        )

    def sweep_time(fn, reps=args.reps):
        """Mean seconds/call over the random-pose sweep inside one program."""

        @jax.jit
        def run(ps, qs, scales):
            def step(acc, xs):
                return acc + fn(*xs), None
            out, _ = jax.lax.scan(step, 0.0, (ps, qs, scales))
            return out

        block(run(ps, qs, scales))
        block(run(ps * 1.0001, qs, scales))  # throwaway timed rep (NOTES.md)
        t0 = time.perf_counter()
        for i in range(reps):
            r = run(ps * (1.0 + 1e-4 * (i + 1)), qs, scales)
            block(r)
        return (time.perf_counter() - t0) / reps / m

    t_mug = sweep_time(lambda p, q, s: jnp.sum(render(mug, backend)(p, q, s)))
    t_sphere = sweep_time(
        lambda p, q, s: jnp.sum(render(sphere, backend)(p, q, s))
    )
    t_xla = (
        sweep_time(
            lambda p, q, s: jnp.sum(render(mug, "xla")(p, q, s)), reps=1
        )
        if backend == "pallas" and not args.quick
        else t_mug
    )

    true_s = jnp.asarray(0.2)
    # compiled-Mosaic parity, wired into the driver path so it cannot
    # silently rot: the production backend must agree with the XLA oracle
    # on the bench scene (hit mask within culling/relaxation stepping
    # noise, depth within 5e-3 on agreeing pixels)
    if backend == "pallas":
        d_pl = np.asarray(render(mug, "pallas")(true_p, q0, true_s))
        d_xla = np.asarray(render(mug, "xla")(true_p, q0, true_s))
        hit_agreement = float(((d_pl > 0) == (d_xla > 0)).mean())
        both = (d_pl > 0) & (d_xla > 0)
        deltas = np.abs(d_pl[both] - d_xla[both])
        max_depth_delta = float(deltas.max())
        p99_depth_delta = float(np.percentile(deltas, 99))
        assert hit_agreement > 0.995, f"Mosaic hit parity broke: {hit_agreement}"
        # hit depths land within the termination band (field < threshold*t);
        # adaptive/culling stepping noise is a few band widths: individual
        # graze pixels may differ by up to ~6*threshold*depth (measured
        # compiled max 8.2e-3 vs interpret 3.6e-3 with mean 0.8e-3), while
        # the bulk must stay within one band
        band = 6.0 * 0.005 * float(d_xla.max())
        assert p99_depth_delta < 5e-3, f"Mosaic depth parity broke (p99): {p99_depth_delta}"
        assert max_depth_delta < band, f"Mosaic depth parity broke (max): {max_depth_delta}"
    else:
        hit_agreement, max_depth_delta, p99_depth_delta = 1.0, 0.0, 0.0

    # production loss program on the mug scene (fused render + pc sampling)
    target = render(mug, backend)(true_p, q0, true_s)
    points, pmask = pointset.depth_to_pointcloud_dense(
        target, camera, order="tile"
    )

    def loss_fn(p, q, s):
        est, pc_vals = render_depth_with_pc_values(
            mug, p, q, s, points, pmask, camera=camera, threshold=0.005,
            backend=backend,
        )
        return L.depth_l1_loss(target, est) + 3.0 * L.masked_mean_abs(
            pc_vals, pmask
        )

    failed_stages = []

    def gated_seconds(name, measure, lo, hi):
        """Timing plausibility gate (round-4 post-mortem: a tunneled
        single-call loop shipped a 3,700x-fast multires timing into the
        driver JSON unflagged).  Every stage timing must land inside a
        physically plausible band derived from sibling measurements; a
        violation triggers ONE re-measure (single-call timings through
        the hosted-TPU tunnel occasionally read far off in either
        direction), and a second violation is recorded in
        ``failed_stages`` so the anomaly ships flagged, never silent."""
        t = measure()
        for attempt in range(2):
            if lo <= t <= hi:
                return t
            if attempt == 0:
                print(
                    f"bench timing {name}={t * 1e3:.3f} ms outside "
                    f"plausible band [{lo * 1e3:.3f}, {hi * 1e3:.3f}] ms; "
                    "re-measuring once",
                    file=sys.stderr,
                )
                t = measure()
        failed_stages.append(
            f"{name}: implausible timing {t:.6f}s "
            f"(plausible band {lo:.6f}-{hi:.6f}s)"
        )
        return t

    # anchor chain: t_grad anchors every refinement band below, so gate it
    # against the forward render first (backward+forward can't be cheaper
    # than the forward alone, nor hundreds of times it)
    t_grad = gated_seconds(
        "grad_sweep",
        lambda: sweep_time(
            lambda p, q, s: jnp.sum(jax.grad(loss_fn, argnums=(0,))(p, q, s)[0])
        ),
        0.5 * t_mug,
        100.0 * t_mug,
    )

    # refinement: scanned Adam steps from a realistic init error (~4 cm off,
    # 10% scale, ~6 deg): the trajectory itself provides distinct states.
    # ONE refine-loop factory serves every stage (full / roi / multires /
    # hypothesis-batch) so cross-stage ratios compare identical methodology.
    optimizer = optax.adam(2e-3)

    def make_refine(lf, n):
        @jax.jit
        def run(state):
            opt_state = optimizer.init(state)

            def step(carry, _):
                st, os_ = carry
                l, g = jax.value_and_grad(
                    lambda s: lf(s["p"], s["q"], s["scale"])
                )(st)
                up, os_ = optimizer.update(g, os_)
                st = optax.apply_updates(st, up)
                st = dict(st, q=st["q"] / jnp.linalg.norm(st["q"]))
                return (st, os_), l

            (st, _), ls = jax.lax.scan(
                step, (state, opt_state), jnp.arange(n)
            )
            return st, ls

        return run

    refine = make_refine(loss_fn, args.refine_iters)

    s0 = {
        "p": true_p + jnp.asarray([0.03, -0.02, 0.02]),
        "q": jnp.asarray([0.05, 0.0, 0.0, 1.0]) / jnp.sqrt(1.0025),
        "scale": true_s * 1.1,
    }
    st, ls = refine(s0)
    block(ls)

    _final_state = {}

    def _measure_refine():
        # one throwaway timed rep: single calls on the tunneled TPU
        # occasionally read far off (see NOTES.md); the steady state needs
        # a warm pipe
        block(refine(dict(s0, p=s0["p"] * 0.9999))[1])
        t0 = time.perf_counter()
        for i in range(max(args.reps, 1)):
            st_, ls_ = refine(dict(s0, p=s0["p"] * (1.0 + 1e-4 * (i + 1))))
        block(ls_)
        _final_state["st"] = st_
        return (time.perf_counter() - t0) / max(args.reps, 1)

    # plausible band: one refinement iteration is one fused fwd+bwd pass
    # plus an Adam update — it cannot beat a fifth of the measured
    # grad-sweep per-call time nor cost fifty times it
    t_refine = gated_seconds(
        "full_refine",
        _measure_refine,
        0.2 * args.refine_iters * t_grad,
        50.0 * args.refine_iters * t_grad,
    )
    st = _final_state["st"]
    refine_iters_per_sec = args.refine_iters / t_refine
    pos_err_first = float(jnp.linalg.norm(s0["p"] - true_p)) * 1000
    pos_err_last = float(jnp.linalg.norm(st["p"] - true_p)) * 1000

    def run_stage(name, fn, default):
        """Optional stages fail soft (a late tunnel hiccup or a diverged
        fast-path schedule must not hide the headline), but every failure
        is recorded in the JSON's ``failed_stages`` so it cannot rot
        silently.  Programming errors (NameError, TypeError, shape
        mismatches) still propagate; the Mosaic parity gate above runs
        outside any stage and stays fatal."""
        try:
            return fn()
        except (RuntimeError, OSError, TimeoutError, AssertionError) as e:
            print(f"bench stage {name} failed soft "
                  f"({type(e).__name__}: {e}); reporting {default}",
                  file=sys.stderr)
            failed_stages.append(f"{name}: {type(e).__name__}: {e}")
            return default

    # ROI refinement (the production fast path): identical losses computed
    # on a 256x192 crop centered on the observed object — the ROI render is
    # exactly the crop of the full render, so this is the same optimization
    # problem with active march tiles scaling by object area
    # ROI inputs (shared by the roi and production stages): the crop render
    # is exactly the crop of the full render, so these losses are the same
    # optimization problem on the same observed pixels.  Skipped in quick
    # mode (the 192x256 crop does not fit the quick raster).
    if not args.quick:
        from sdfest_tpu.pipeline.pipeline import _roi_offset_for

        roi = (192, 256)
        roi_off = _roi_offset_for(target, roi)
        target_roi = jax.lax.dynamic_slice(
            target, (roi_off[0], roi_off[1]), roi
        )
        # ROI-lifted pc cloud: exactly the valid points of the full lift
        # (production _refine path does the same)
        points_roi, pmask_roi = pointset.depth_to_pointcloud_dense(
            target_roi, camera, order="tile", pixel_offset=roi_off
        )

        def loss_fn_roi(p, q, s):
            est, pc_vals = render_depth_with_pc_values(
                mug, p, q, s, points_roi, pmask_roi, camera=camera,
                threshold=0.005, backend=backend, roi=roi,
                roi_offset=roi_off,
            )
            return L.depth_l1_loss(
                target_roi, est
            ) + 3.0 * L.masked_mean_abs(pc_vals, pmask_roi)

    def _roi_stage():
        refine_roi = make_refine(loss_fn_roi, args.refine_iters)

        st_roi, ls_roi = refine_roi(s0)
        block(ls_roi)
        out = {}

        def measure():
            block(refine_roi(dict(s0, p=s0["p"] * 0.9999))[1])
            t0 = time.perf_counter()
            for i in range(max(args.reps, 1)):
                st_, ls_ = refine_roi(
                    dict(s0, p=s0["p"] * (1.0 + 1e-4 * (i + 1)))
                )
            block(ls_)
            out["st"] = st_
            return (time.perf_counter() - t0) / max(args.reps, 1)

        # the ROI crop shrinks raster-proportional work, never below ~1/16
        # of the full-frame program, and cannot be slower than ~4x it
        t_roi = gated_seconds(
            "roi_refine", measure, t_refine / 16.0, 4.0 * t_refine
        )
        st_roi = out["st"]
        # ROI refinement must converge like the full-frame program
        pos_err_roi = float(jnp.linalg.norm(st_roi["p"] - true_p)) * 1000
        assert pos_err_roi < 3 * max(pos_err_last, 2.0), (
            f"ROI refinement diverged: {pos_err_roi} mm vs {pos_err_last}"
        )
        return args.refine_iters / t_roi

    roi_iters_per_sec = (
        run_stage("roi_refine", _roi_stage, 0.0) if not args.quick else 0.0
    )

    # coarse-to-fine refinement (pipeline multires_factor=2 schedule: 60%
    # of the iteration budget against the strided quarter-raster — the
    # SAME optimization problem on a pixel subset (Camera.strided), with
    # ~1/4 the active march tiles — then the rest at full resolution)
    n_coarse = (args.refine_iters * 3) // 5
    n_fine = args.refine_iters - n_coarse
    if not args.quick:

        def strided_loss(factor, with_roi):
            """Loss program on the factor-strided sub-observation, optionally
            on its stride-scaled ROI crop (the pipeline's production
            composition: ``_roi_for(depth_coarse, factor)`` scales ROI sizes
            and wander margin by 1/stride; the crop render stays an exact
            crop of the strided render)."""
            cam_f = camera.strided(factor)
            target_f = target[::factor, ::factor]
            if not with_roi:
                points_f, pmask_f = pointset.depth_to_pointcloud_dense(
                    target_f, cam_f, order="tile"
                )
                roi_f, roi_off_f = None, None
            else:
                roi_f = (roi[0] // factor, roi[1] // factor)
                roi_off_f = _roi_offset_for(target_f, roi_f)
                target_f = jax.lax.dynamic_slice(
                    target_f, (roi_off_f[0], roi_off_f[1]), roi_f
                )
                points_f, pmask_f = pointset.depth_to_pointcloud_dense(
                    target_f, cam_f, order="tile", pixel_offset=roi_off_f
                )

            def lf(p, q, s):
                est, pc_vals = render_depth_with_pc_values(
                    mug, p, q, s, points_f, pmask_f, camera=cam_f,
                    threshold=0.005, backend=backend, roi=roi_f,
                    roi_offset=roi_off_f,
                )
                return L.depth_l1_loss(
                    target_f, est
                ) + 3.0 * L.masked_mean_abs(pc_vals, pmask_f)

            return lf

        loss_fn2 = strided_loss(2, with_roi=False)
        loss_fn2_roi = strided_loss(2, with_roi=True)
        loss_fn4_roi = strided_loss(4, with_roi=True)

    def _timed_schedule(name, *phase_fns):
        """Time a multi-phase schedule with the standard sweep discipline."""

        def run(state):
            st = state
            for fn in phase_fns[:-1]:
                st, _ = fn(st)
            return phase_fns[-1](st)

        st_s, ls_s = run(s0)
        block(ls_s)
        out = {}

        def measure():
            block(run(dict(s0, p=s0["p"] * 0.9999))[1])
            t0 = time.perf_counter()
            for i in range(max(args.reps, 1)):
                st_, ls_ = run(dict(s0, p=s0["p"] * (1.0 + 1e-4 * (i + 1))))
            block(ls_)
            out["st"] = st_
            return (time.perf_counter() - t0) / max(args.reps, 1)

        # coarse phases shrink per-iteration cost at most ~16x (stride 4);
        # a schedule can also never be slower than ~4x the single-phase
        # program (round 4 shipped a 3,700x-fast glitch here unflagged)
        t_s = gated_seconds(name, measure, t_refine / 16.0, 4.0 * t_refine)
        st_s = out["st"]
        pos_err_s = float(jnp.linalg.norm(st_s["p"] - true_p)) * 1000
        # every schedule must converge like the single-phase program
        assert pos_err_s < 3 * max(pos_err_last, 2.0), (
            f"{name} refinement diverged: {pos_err_s} mm vs {pos_err_last}"
        )
        return args.refine_iters / t_s, t_refine / t_s

    def _multires_stage():
        return _timed_schedule(
            "multires",
            make_refine(loss_fn2, n_coarse),
            make_refine(loss_fn, n_fine),
        )

    multires_iters_per_sec, multires_speedup = (
        run_stage("multires_refine", _multires_stage, (0.0, 0.0))
        if not args.quick
        else (0.0, 0.0)
    )

    # production fast path (configs/estimation/fast.yaml): the [4, 2]
    # multi-level coarse-to-fine schedule, each level with its
    # stride-scaled ROI, then the full-resolution ROI finish — exactly the
    # schedule a deployment runs (pipeline auto split: 80% of the budget
    # evenly across the coarse levels, i.e. 20/20/10 at 50 iterations)
    n_lvl = (args.refine_iters * 4) // 10
    n_finish = args.refine_iters - 2 * n_lvl

    def _production_stage():
        return _timed_schedule(
            "production",
            make_refine(loss_fn4_roi, n_lvl),
            make_refine(loss_fn2_roi, n_lvl),
            make_refine(loss_fn_roi, n_finish),
        )

    production_iters_per_sec, production_speedup = (
        run_stage("production_refine", _production_stage, (0.0, 0.0))
        if not args.quick
        else (0.0, 0.0)
    )

    # compiled-gradient parity (every driver run): the fused render+pc VJP
    # the production loss differentiates must match the XLA oracle's
    # analytic gradients on the bench pose — forward parity alone cannot
    # catch a rotted backward kernel.  Three comparisons:
    #   * surrogate VJP at the SAME forward depth: both backwards are pure
    #     functions of (sdf, pose, depth) — the analytic depth surrogate
    #     differentiated at the forward's hit raster (render/api.py
    #     `_render_pallas_bwd`).  Feeding the pallas forward's depth to BOTH
    #     surrogates isolates the backward machinery (kernel sampling +
    #     matmul scatter vs XLA gathers) from march stepping, so all four
    #     cotangent channels compare at fp32-rounding tolerances (measured
    #     <=6e-6 on v5e).  This is the rot detector for the backward itself.
    #   * end-to-end deterministic march (culling/adaptive/bf16 off on both
    #     paths) and production march (defaults): pose/quaternion/scale
    #     channels with a stepping-noise allowance.  The sdf-grid cotangent
    #     is excluded from BOTH end-to-end comparisons by design: the two
    #     marches legitimately terminate graze rays at slightly different t
    #     (fp32 op-ordering in exact mode, culling/adaptive relaxation in
    #     production — measured 0.16 normalized on the bench mug even exact)
    #     so the trilinear scatter deposits onto neighboring voxels; a
    #     per-voxel comparison across differently-stepped marches measures
    #     stepping noise, not kernel rot.  Pose channels integrate over the
    #     raster and stay comparable.
    def _grad_parity_stage():
        from sdfest_tpu.render import api as _rapi
        from sdfest_tpu.render import xla as _rxla

        deltas = {}

        # -- same-depth surrogate VJP parity (all four channels, tight) --
        depth_pl = render_depth(
            mug, s0["p"], s0["q"], s0["scale"], camera=camera,
            threshold=0.005, backend=backend,
            culling=False, adaptive=False, bf16=False,
        )
        dirs = _rapi._roi_dirs(camera, mug.dtype, None,
                               jnp.zeros((2,), jnp.int32))
        cot = jax.grad(lambda d: L.depth_l1_loss(target, d))(depth_pl)

        def surrogate_grads(surr):
            def go():
                _, vjp = jax.vjp(
                    lambda s, p, q, i: surr(s, p, q, i, depth_pl, dirs),
                    mug, s0["p"], s0["q"], s0["scale"],
                )
                return vjp(cot)
            return jax.jit(go)()

        g_pl = surrogate_grads(_rapi._surrogate_with_op)
        g_xla = surrogate_grads(_rxla._depth_surrogate)
        for name, a, b in zip(
            ("sdf", "position", "quaternion", "inv_scale"), g_xla, g_pl
        ):
            a, b = np.asarray(a), np.asarray(b)
            scale_ = max(float(np.abs(a).max()), 1e-9)
            d = float(np.abs(a - b).max() / scale_)
            deltas[f"surrogate_{name}"] = round(d, 8)
            assert d < 5e-4, (
                f"backward-kernel parity broke (surrogate/{name}: "
                f"{d} >= 5e-4): {deltas}"
            )
        def make_loss(bk, exact):
            kw = (
                dict(culling=False, adaptive=False, bf16=False)
                if exact
                else {}
            )

            def lf(p, q, s, sdf):
                est, pc_vals = render_depth_with_pc_values(
                    sdf, p, q, s, points, pmask, camera=camera,
                    threshold=0.005, backend=bk, **kw,
                )
                return L.depth_l1_loss(target, est) + 3.0 * L.masked_mean_abs(
                    pc_vals, pmask
                )
            return lf

        wrt = (0, 1, 2, 3)
        names = ("position", "quaternion", "scale", "sdf")
        gargs = (s0["p"], s0["q"], s0["scale"], mug)
        for mode, exact, tol, chans in (
            ("exact", True, 1e-2, names[:3]),
            ("production", False, 5e-2, names[:3]),
        ):
            g_pl = jax.jit(
                jax.grad(make_loss(backend, exact), argnums=wrt)
            )(*gargs)
            g_xla = jax.jit(
                jax.grad(make_loss("xla", exact), argnums=wrt)
            )(*gargs)
            for name, a, b in zip(names, g_xla, g_pl):
                if name not in chans:
                    continue
                a, b = np.asarray(a), np.asarray(b)
                scale_ = max(float(np.abs(a).max()), 1e-6)
                d = float(np.abs(a - b).max() / scale_)
                deltas[f"{mode}_{name}"] = round(d, 6)
                assert d < tol, (
                    f"fused-VJP gradient parity broke "
                    f"({mode}/{name}: {d} >= {tol}): {deltas}"
                )
        return deltas

    grad_parity = (
        run_stage("grad_parity", _grad_parity_stage, {})
        if backend == "pallas" and not args.quick
        else {}
    )

    # hypothesis-parallel refinement (vmap of the same program over N
    # independent starts — the capability the reference lacks entirely;
    # aggregate hyp-iters/s is the production throughput number)
    n_hyp = 0 if args.quick else args.hypotheses

    def _hyp_stage():
        keys = jax.random.split(jax.random.PRNGKey(7), n_hyp)
        batch0 = {
            "p": s0["p"][None]
            + 0.01 * jax.random.normal(keys[0], (n_hyp, 3)),
            "q": jnp.tile(s0["q"], (n_hyp, 1)),
            "scale": jnp.full((n_hyp,), float(true_s) * 1.1),
        }
        refine_b = jax.jit(jax.vmap(refine))
        block(refine_b(batch0)[1])

        def measure():
            block(refine_b(dict(batch0, p=batch0["p"] * 0.9999))[1])
            t0 = time.perf_counter()
            for i in range(max(args.reps, 1)):
                _, lsb = refine_b(
                    dict(batch0, p=batch0["p"] * (1.0 + 1e-4 * (i + 1)))
                )
            block(lsb)
            return (time.perf_counter() - t0) / max(args.reps, 1)

        # a batch of n_hyp refinements costs at least one refinement and
        # at most ~4x n_hyp sequential ones
        t_b = gated_seconds(
            "hypothesis_batch", measure,
            0.5 * t_refine, 4.0 * n_hyp * t_refine,
        )
        return n_hyp * args.refine_iters / t_b

    hyp_iters_per_sec = (
        run_stage("hypothesis_batch", _hyp_stage, 0.0) if n_hyp else 0.0
    )

    # batched hypotheses under the PRODUCTION schedule (multires coarse +
    # ROI fine) — the configuration where single-chip batching can actually
    # win: per-hypothesis rasters shrink ~2.5x, so one refinement no longer
    # saturates the chip and independent hypotheses fill the slack.  This
    # is the number the multi-chip scale-out story extrapolates from
    # (each mesh device runs hypotheses at THIS rate).
    def _batched_production_stage():
        keys = jax.random.split(jax.random.PRNGKey(11), 2)
        batch0 = {
            "p": s0["p"][None]
            + 0.01 * jax.random.normal(keys[0], (n_hyp, 3)),
            "q": jnp.tile(s0["q"], (n_hyp, 1)),
            "scale": jnp.full((n_hyp,), float(true_s) * 1.1),
        }
        phase_fns = (
            make_refine(loss_fn4_roi, n_lvl),
            make_refine(loss_fn2_roi, n_lvl),
            make_refine(loss_fn_roi, n_finish),
        )

        def one(state):
            st = state
            for fn in phase_fns[:-1]:
                st, _ = fn(st)
            return phase_fns[-1](st)

        run_b = jax.jit(jax.vmap(one))
        st_b, ls_b = run_b(batch0)
        block(ls_b)
        out = {}

        def measure():
            block(run_b(dict(batch0, p=batch0["p"] * 0.9999))[1])
            t0 = time.perf_counter()
            for i in range(max(args.reps, 1)):
                st_, ls_ = run_b(
                    dict(batch0, p=batch0["p"] * (1.0 + 1e-4 * (i + 1)))
                )
            block(ls_)
            out["st"] = st_
            return (time.perf_counter() - t0) / max(args.reps, 1)

        # batched production: cheaper per hypothesis than full-frame (the
        # coarse/ROI raster shrink), never below 1/16th of one full-frame
        # refinement total, never above ~4x n_hyp sequential ones
        t_b = gated_seconds(
            "batched_production", measure,
            t_refine / 16.0, 4.0 * n_hyp * t_refine,
        )
        st_b = out["st"]
        # every hypothesis starts ~where s0 does; all must converge
        errs = np.linalg.norm(
            np.asarray(st_b["p"]) - np.asarray(true_p), axis=-1
        ) * 1000
        assert float(errs.max()) < 3 * max(pos_err_last, 2.0), (
            f"batched production refinement diverged: {errs}"
        )
        return n_hyp * args.refine_iters / t_b

    batched_production_hyp_iters_per_sec = (
        run_stage("batched_production", _batched_production_stage, 0.0)
        if n_hyp and production_iters_per_sec > 0.0
        else 0.0
    )

    # estimation accuracy with REAL trained weights: the reference ships a
    # trained mug VAE fixture (/root/reference/tests/initilization/
    # vae_model/mug.pt); convert it with the golden-tested machinery, decode
    # a latent to a mug SDF, render a view, and recover the perturbed
    # (pose, scale, latent) by refinement THROUGH the decoder — the full
    # production gradient chain (decoder VJP -> fused render+pc VJP) on
    # trained weights, reported as pose error and a near-surface shape
    # residual (BASELINE.json parity config 5 evidence).
    def _trained_vae_stage():
        import os

        import yaml as _yaml

        fdir = "/root/reference/tests/initilization/vae_model"
        if not os.path.isdir(fdir):
            raise RuntimeError("trained-VAE fixture unavailable")
        from sdfest_tpu.models.vae import SDFVAE
        from sdfest_tpu.utils import weights as weight_utils

        with open(os.path.join(fdir, "mug.yaml")) as f:
            vcfg = _yaml.safe_load(f)
        vae = SDFVAE(
            sdf_size=64,
            latent_size=vcfg["latent_size"],
            encoder=vcfg["encoder"],
            decoder=vcfg["decoder"],
            tsdf=vcfg.get("tsdf", False),
        )
        params = weight_utils.load_vae_params(
            dict(vcfg, model=os.path.join(fdir, "mug.pt")), vae, 64
        )
        decode = lambda z: vae.apply(
            {"params": params}, z[None], method=vae.decode
        )[0, 0]
        z_true = 0.8 * jax.random.normal(
            jax.random.PRNGKey(20), (vcfg["latent_size"],), jnp.float32
        )
        sdf_true = decode(z_true)
        s_true = jnp.asarray(0.15)
        target_t = render(sdf_true, backend)(true_p, q0, s_true)
        points_t, pmask_t = pointset.depth_to_pointcloud_dense(
            target_t, camera, order="tile"
        )

        # PRODUCTION schedule (fast.yaml: multires [4, 2] + stride-scaled
        # ROI, 40/40/20 split) at the reference's real275-class budget of
        # 3 x refine_iters (= 150 at the default 50): the round-4
        # convergence study (NOTES.md "Latent-refinement convergence
        # study", reproduction_scripts/latent_refinement_study.py) showed
        # the shape residual needs ~150 iterations to converge (0.0219 ->
        # 0.004 at latent LR 3e-2; at 50 iterations every LR leaves it
        # ~0.02), and that the production schedule matches single-phase
        # quality at that budget.  Latent LR 3e-2 is the study's optimum
        # (1e-1 diverges, <=1e-2 undershoots at equal budget).
        from sdfest_tpu.pipeline.pipeline import _roi_offset_for as _roi_off

        roi_hw = (192, 256)
        t_iters = 3 * args.refine_iters

        def make_loss_t(factor, with_roi):
            cam_f = camera if factor == 1 else camera.strided(factor)
            target_f = target_t[::factor, ::factor]
            if with_roi:
                roi_f = (roi_hw[0] // factor, roi_hw[1] // factor)
                roi_off_f = _roi_off(target_f, roi_f)
                target_f = jax.lax.dynamic_slice(
                    target_f, (roi_off_f[0], roi_off_f[1]), roi_f
                )
                pts, msk = pointset.depth_to_pointcloud_dense(
                    target_f, cam_f, order="tile", pixel_offset=roi_off_f
                )
            else:
                roi_f, roi_off_f = None, None
                pts, msk = pointset.depth_to_pointcloud_dense(
                    target_f, cam_f, order="tile"
                )

            def lf(st):
                sdf = decode(st["latent"])
                est, pc_vals = render_depth_with_pc_values(
                    sdf, st["position"], st["orientation"], st["scale"],
                    pts, msk, camera=cam_f, threshold=0.005,
                    backend=backend, roi=roi_f, roi_offset=roi_off_f,
                )
                return L.depth_l1_loss(target_f, est) + 3.0 * L.masked_mean_abs(
                    pc_vals, msk
                )

            return lf

        lrs = {
            "position": -1e-3,
            "orientation": -1e-2,
            "scale": -1e-3,
            "latent": -3e-2,
        }
        adam = optax.scale_by_adam()

        def make_phase_t(loss_fn, n):
            def phase(state):
                opt_state = adam.init(state)

                def step(carry, _):
                    st, os_ = carry
                    l, g = jax.value_and_grad(loss_fn)(st)
                    up, os_ = adam.update(g, os_)
                    st = optax.apply_updates(
                        st, {k: lrs[k] * v for k, v in up.items()}
                    )
                    st = dict(
                        st,
                        orientation=st["orientation"]
                        / jnp.linalg.norm(st["orientation"]),
                    )
                    return (st, os_), l

                (st, _), ls = jax.lax.scan(
                    step, (state, opt_state), None, length=n
                )
                return st, ls

            return phase

        n_lvl = (t_iters * 4) // 10
        n_fin = t_iters - 2 * n_lvl
        phase4 = make_phase_t(make_loss_t(4, True), n_lvl)
        phase2 = make_phase_t(make_loss_t(2, True), n_lvl)
        phase1 = make_phase_t(make_loss_t(1, True), n_fin)

        @jax.jit
        def refine_t(state):
            st, ls_a = phase4(state)
            st, ls_b = phase2(st)
            st, ls_c = phase1(st)
            return st, jnp.concatenate([ls_a, ls_b, ls_c])

        st0 = {
            "position": true_p + jnp.asarray([0.03, -0.02, 0.02]),
            "orientation": jnp.asarray([0.05, 0.0, 0.0, 1.0])
            / jnp.sqrt(1.0025),
            "scale": s_true * 1.1,
            "latent": z_true
            + 0.4
            * jax.random.normal(
                jax.random.PRNGKey(21), z_true.shape, jnp.float32
            ),
        }
        st_t, ls_t = refine_t(st0)
        block(ls_t)
        out = {}

        def measure():
            block(refine_t(dict(st0, position=st0["position"] * 0.9999))[1])
            t0 = time.perf_counter()
            for i in range(max(args.reps, 1)):
                st_, ls_ = refine_t(
                    dict(st0,
                         position=st0["position"] * (1.0 + 1e-4 * (i + 1)))
                )
            block(ls_)
            out["st"] = st_
            return (time.perf_counter() - t0) / max(args.reps, 1)

        # production schedule at t_iters budget through the decoder: per
        # iteration it adds the decoder fwd+bwd to the march, so the band
        # spans [1/16th of, 20x] the equal-budget full-frame time
        t_t = gated_seconds(
            "trained_vae_refine", measure,
            (t_iters / args.refine_iters) * t_refine / 16.0,
            (t_iters / args.refine_iters) * t_refine * 20.0,
        )
        st_t = out["st"]
        # near-surface shape residual of the recovered latent (grid units)
        band = jnp.abs(sdf_true) < 0.1
        sdf_rec = decode(st_t["latent"])
        shape_res_first = float(
            jnp.abs(decode(st0["latent"]) - sdf_true)[band].mean()
        )
        shape_res_last = float(jnp.abs(sdf_rec - sdf_true)[band].mean())
        pe_first = float(
            jnp.linalg.norm(st0["position"] - true_p)
        ) * 1000
        pe_last = float(jnp.linalg.norm(st_t["position"] - true_p)) * 1000
        assert pe_last < pe_first / 3, (
            f"trained-VAE refinement did not converge: {pe_first} -> {pe_last} mm"
        )
        # the study's convergence bar: the shape residual must actually
        # drop (round-3 review flagged a -4.6% drop as unexplained; the
        # production schedule at the study budget reaches ~-70-80%)
        assert shape_res_last < 0.6 * shape_res_first, (
            f"shape residual did not converge: "
            f"{shape_res_first} -> {shape_res_last}"
        )
        return {
            "schedule": "production multires[4,2]+roi, latent_lr 3e-2",
            "iters": t_iters,
            "refine_iters_per_sec": round(t_iters / t_t, 2),
            "pos_err_first_last_mm": [round(pe_first, 1), round(pe_last, 2)],
            "scale_err_first_last_pct": [
                round(float(abs(st0["scale"] / s_true - 1)) * 100, 2),
                round(float(abs(st_t["scale"] / s_true - 1)) * 100, 2),
            ],
            "shape_residual_first_last": [
                round(shape_res_first, 4),
                round(shape_res_last, 4),
            ],
            "loss_first_last": [
                round(float(ls_t[0]), 4),
                round(float(ls_t[-1]), 4),
            ],
        }

    trained_vae = (
        run_stage("trained_vae_refine", _trained_vae_stage, {})
        if not args.quick
        else {}
    )

    # single-shot accuracy of the FRAMEWORK-TRAINED init network
    # (docs/training_demo.md; BASELINE parity config 4): load the demo
    # artifacts, sample held-out generated views (a stream disjoint from
    # every training/validation loader seed), and report the reference's
    # validation metrics (/root/reference/sdfest/initialization/scripts/
    # train.py:344-374) as interpretable errors.
    def _init_accuracy_stage():
        import math
        import os

        from sdfest_tpu.datasets.generated import SDFVAEViewDataset
        from sdfest_tpu.models.vae import create_vae_from_config
        from sdfest_tpu.ops import quaternion as quat_ops
        from sdfest_tpu.training.init_trainer import InitTrainer
        from sdfest_tpu.utils import weights as weight_utils
        from sdfest_tpu.utils.config import load_config

        import sdfest_tpu as _pkg

        # repo root: explicit SDFEST_TPU_REPO override first (a
        # site-packages install's package parent holds no trained_models/
        # tree), package-anchored parent as the in-repo/editable default
        # (robust to exec()/runpy invocation)
        repo = os.environ.get("SDFEST_TPU_REPO") or os.path.dirname(
            os.path.dirname(os.path.abspath(_pkg.__file__))
        )
        mcfg = load_config(
            {
                "config": [
                    os.path.join(
                        repo,
                        "sdfest_tpu/configs/estimation/models/"
                        "mug_procedural.yaml",
                    )
                ]
            }
        )
        vae_path = os.path.join(repo, mcfg["vae"]["model"])
        init_path = os.path.join(repo, mcfg["init"]["model"])
        if not (os.path.exists(vae_path) and os.path.exists(init_path)):
            raise RuntimeError(
                "trained demo artifacts missing (run the docs/"
                "training_demo.md recipes)"
            )
        vae = create_vae_from_config(mcfg["vae"])
        vae_params = weight_utils.load_vae_params(
            dict(mcfg["vae"], model=vae_path), vae, 64
        )
        icfg = dict(mcfg["init"], model=init_path)
        num_points = icfg.get("num_points", 2500)
        trainer = InitTrainer(icfg, latent_size=mcfg["vae"]["latent_size"])
        state = weight_utils.load_init_variables(
            icfg, trainer.net, num_points
        )
        ds_cfg = dict(
            icfg["datasets"]["generated_dataset"]["config_dict"],
            num_points=num_points,
        )
        dataset = SDFVAEViewDataset(ds_cfg, vae, vae_params)

        key = jax.random.PRNGKey(7770001)  # held-out stream

        # one compiled program per batch (predict + error sums): separate
        # eager reductions each pay a remote-compile/dispatch round trip
        # on a hosted TPU (minutes of pure latency)
        @jax.jit
        def batch_sums(state, batch):
            _, position, scale, orientation = trainer.predict(state, batch["pointset"])
            v = batch["valid"].astype(jnp.float32)
            # reference decode semantics (initialization/scripts/
            # train.py:344-363): argmax cell -> grid.index_to_quat ->
            # geodesic vs the GT quaternion, no symmetry folding
            pred_q = jnp.asarray(trainer.grid_quats)[
                jnp.argmax(orientation, axis=-1)
            ]
            return {
                "pos": jnp.sum(
                    v * jnp.linalg.norm(position - batch["position"], axis=-1)
                ),
                "scale": jnp.sum(
                    v * jnp.abs(scale - batch["scale"]) / batch["scale"]
                ),
                "geo": jnp.sum(
                    v * quat_ops.geodesic_distance(pred_q, batch["quaternion"])
                ),
                "n": jnp.sum(v),
            }

        sums = {"pos": 0.0, "scale": 0.0, "geo": 0.0, "n": 0.0}
        for _ in range(8):  # 8 x batch 8 = 64 held-out views
            key, subkey = jax.random.split(key)
            batch = dataset.sample_batch(subkey, 8)
            got = jax.device_get(batch_sums(state, batch))
            for k in sums:
                sums[k] += float(got[k])
        n = max(sums["n"], 1.0)
        return {
            "held_out_views": int(n),
            "position_error_mm": round(sums["pos"] / n * 1000, 2),
            "scale_error_pct": round(sums["scale"] / n * 100, 2),
            "orientation_geodesic_deg": round(
                math.degrees(sums["geo"] / n), 2
            ),
        }

    init_accuracy = (
        run_stage("init_accuracy", _init_accuracy_stage, {})
        if not args.quick
        else {}
    )

    # headline = the shipped production schedule (configs/estimation/
    # fast.yaml: multires [4, 2] + ROI — the SAME optimization problem on
    # exact crops / exactly-strided sub-observations, quality pinned by the
    # rendering-eval ablations in NOTES.md).  Falls back to the full-frame
    # single-phase rate if the production stage failed soft.
    headline = production_iters_per_sec or refine_iters_per_sec
    headline_name = (
        "mug_production_refine_iters_per_sec_640x480_64cube"
        if production_iters_per_sec
        else "mug_refine_iters_per_sec_640x480_64cube"
    )
    result = {
        "metric": headline_name
        if not args.quick
        else "mug_refine_iters_per_sec_quick",
        "value": round(headline, 2),
        "unit": "refine iters/s",
        "vs_baseline": round(headline / REF_EST_ITERS_PER_SEC, 2),
        "detail": {
            "backend": backend,
            "vs_baseline_meaning": "multiple over the documented estimate of "
            "the reference CUDA/torch refinement rate (~50 it/s midpoint; "
            "BASELINE.md 'Reference anchor'), for the shipped production "
            "schedule (fast.yaml); the single-phase full-frame multiple is "
            "full_refine_iters_per_sec / 50",
            "full_refine_iters_per_sec": round(refine_iters_per_sec, 2),
            "vs_baseline_full_frame": round(
                refine_iters_per_sec / REF_EST_ITERS_PER_SEC, 2
            ),
            "mug_render_ms": round(t_mug * 1000, 2),
            "sphere_render_ms": round(t_sphere * 1000, 2),
            "mug_renders_per_sec": round(1.0 / t_mug, 2),
            "xla_oracle_render_ms": round(t_xla * 1000, 2),
            "kernel_vs_xla_same_device": round(t_xla / t_mug, 2),
            "fwd_bwd_ms": round(t_grad * 1000, 2),
            "pos_err_first_last_mm": [round(pos_err_first, 1),
                                      round(pos_err_last, 2)],
            "roi_refine_iters_per_sec": round(roi_iters_per_sec, 2),
            "multires_refine_iters_per_sec": round(multires_iters_per_sec, 2),
            "multires_speedup_vs_full": round(multires_speedup, 2),
            "production_refine_iters_per_sec": round(
                production_iters_per_sec, 2
            ),
            "production_speedup_vs_full": round(production_speedup, 2),
            "batched_hyp_iters_per_sec": round(hyp_iters_per_sec, 2),
            "batched_hypotheses": n_hyp,
            "batched_production_hyp_iters_per_sec": round(
                batched_production_hyp_iters_per_sec, 2
            ),
            # aggregate batched-production throughput vs running the same N
            # hypotheses sequentially single-stream (>1: batching wins)
            "batched_production_speedup_vs_n_single": round(
                batched_production_hyp_iters_per_sec
                / production_iters_per_sec,
                2,
            )
            if production_iters_per_sec > 0
            else 0.0,
            "trained_vae_refine": trained_vae,
            "init_accuracy": init_accuracy,
            "mosaic_parity": {
                "hit_agreement": round(hit_agreement, 5),
                "p99_depth_delta": round(p99_depth_delta, 6),
                "max_depth_delta": round(max_depth_delta, 6),
                # normalized max gradient deltas, fused pallas VJP vs the
                # XLA oracle (position/quaternion/scale/sdf cotangents)
                "grad_parity": grad_parity,
            },
            "loss_first_last": [round(float(ls[0]), 4),
                                round(float(ls[-1]), 4)],
            "failed_stages": failed_stages,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
