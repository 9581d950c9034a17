"""Benchmark: differentiable depth rendering + refinement throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric (BASELINE.json): depth renders/sec at 640x480 with a 64^3
SDF on the available accelerator.  ``vs_baseline`` reports the speedup of
the production backend (Pallas on TPU) over the pure-XLA gather-based path
on the same device — the honest measure of what the TPU-native kernel
design buys (the reference repo publishes no numbers, BASELINE.md).

All timings chain each iteration's input through the previous output so
lazily-executing runtimes cannot skip work.
"""
import argparse
import json
import sys
import time

import numpy as np


def make_sphere_sdf(res=64, radius=0.5):
    c = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    return (np.sqrt(x * x + y * y + z * z) - radius).astype(np.float32)


def chained_time(f, x0, n, block):
    """Mean seconds/call of x -> f(x), output chained into the next input."""
    x = f(x0)
    block(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    block(x)
    return (time.perf_counter() - t0) / n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="small sizes (CI)")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--refine-iters", type=int, default=50)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from sdfest_tpu.ops.camera import Camera
    from sdfest_tpu.ops import pointset
    from sdfest_tpu.pipeline import losses as L
    from sdfest_tpu.render import render_depth, resolve_backend

    if args.quick:
        camera = Camera(width=160, height=112, fx=80, fy=80, cx=80, cy=56,
                        pixel_center=0.5)
        args.iters, args.refine_iters = 3, 5
    else:
        camera = Camera(width=640, height=480, fx=320, fy=320, cx=320, cy=240,
                        pixel_center=0.5)

    block = jax.block_until_ready
    sdf = jnp.asarray(make_sphere_sdf(64))
    true_p = jnp.asarray([0.02, -0.01, -0.5])
    quat = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    inv_scale = jnp.asarray(5.0)

    def render(backend):
        return lambda p: render_depth(
            sdf, p, quat, inv_scale, camera=camera, threshold=0.005,
            backend=backend,
        )

    def render_chain(backend):
        r = render(backend)
        return lambda p: true_p + 1e-4 * jnp.tanh(jnp.sum(r(p)))

    backend = resolve_backend("auto")
    t_fwd = chained_time(render_chain(backend), true_p, args.iters, block)
    renders_per_sec = 1.0 / t_fwd

    # XLA reference path on the same device (slower on TPU; same on CPU)
    t_xla = (
        chained_time(render_chain("xla"), true_p, max(args.iters // 3, 1), block)
        if backend == "pallas"
        else t_fwd
    )

    # full gradient step: render + masked L1 + pc loss + backward
    target = render(backend)(true_p)
    points, pmask = pointset.depth_to_pointcloud_dense(target, camera)

    def loss_fn(p):
        est = render(backend)(p)
        return L.depth_l1_loss(target, est) + 3.0 * L.masked_pc_loss(
            points, pmask, p, quat, 1.0 / inv_scale, sdf
        )

    grad_fn = jax.jit(jax.grad(loss_fn))
    t_grad = chained_time(
        lambda p: true_p + 1e-4 * jnp.tanh(jnp.sum(grad_fn(p))),
        true_p,
        max(args.iters // 2, 1),
        block,
    )

    # refinement loop: scanned Adam steps, one XLA program
    optimizer = optax.adam(1e-3)

    @jax.jit
    def refine(state):
        opt_state = optimizer.init(state)

        def step(carry, _):
            st, os_ = carry

            def loss(s):
                est = render_depth(
                    sdf, s["p"], s["q"], 1.0 / s["scale"], camera=camera,
                    threshold=0.005, backend=backend,
                )
                return L.depth_l1_loss(target, est) + 3.0 * L.masked_pc_loss(
                    points, pmask, s["p"], s["q"], s["scale"], sdf
                )

            l, g = jax.value_and_grad(loss)(st)
            up, os_ = optimizer.update(g, os_)
            st = optax.apply_updates(st, up)
            st = dict(st, q=st["q"] / jnp.linalg.norm(st["q"]))
            return (st, os_), l

        (st, _), ls = jax.lax.scan(step, (state, opt_state), None,
                                   length=args.refine_iters)
        return st, ls

    s0 = {
        "p": true_p + jnp.asarray([0.04, -0.03, 0.05]),
        "q": jnp.asarray([0.05, 0.0, 0.0, 1.0]) / jnp.sqrt(1.0025),
        "scale": jnp.asarray(0.24),
    }

    def refine_chain(s):
        st, ls = refine(s)
        return dict(st, p=s0["p"] + 1e-4 * jnp.tanh(ls[-1]))

    t_refine = chained_time(refine_chain, s0, max(args.iters // 3, 1), block)
    refine_iters_per_sec = args.refine_iters / t_refine

    result = {
        "metric": "depth_renders_per_sec_640x480_64cube"
        if not args.quick
        else "depth_renders_per_sec_quick",
        "value": round(renders_per_sec, 2),
        "unit": "renders/s",
        "vs_baseline": round(t_xla / t_fwd, 2),
        "detail": {
            "backend": backend,
            "render_ms": round(t_fwd * 1000, 2),
            "xla_render_ms": round(t_xla * 1000, 2),
            "fwd_bwd_ms": round(t_grad * 1000, 2),
            "refine_iters_per_sec": round(refine_iters_per_sec, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
