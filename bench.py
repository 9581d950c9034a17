"""Benchmark: batched differentiable depth rendering + refinement throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric (BASELINE.json): depth renders/sec at 640x480 with a 64^3
SDF, batched over hypotheses, on the available accelerator.  The reference
repo publishes no numbers (BASELINE.md), so ``vs_baseline`` is reported
against the reference's CUDA design point of one render per kernel launch
measured here as batch-1 JAX throughput (i.e. the batching/fusion speedup);
sub-metrics are included for the full refinement loop.
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="small sizes (CI)")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--refine-iters", type=int, default=50)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from sdfest_tpu.ops.camera import Camera
    from sdfest_tpu.render import render_depth

    if args.quick:
        camera = Camera(width=160, height=120, fx=80, fy=80, cx=80, cy=60,
                        pixel_center=0.5)
        args.batch, args.iters, args.refine_iters = 4, 3, 5
    else:
        camera = Camera(width=640, height=480, fx=320, fy=320, cx=320, cy=240,
                        pixel_center=0.5)

    sdf = jnp.asarray(make_sphere_sdf(64))
    batch = args.batch
    key = jax.random.PRNGKey(0)
    positions = jnp.asarray([0.0, 0.0, -0.5]) + 0.05 * jax.random.normal(
        key, (batch, 3)
    )
    quats = jax.random.normal(jax.random.PRNGKey(1), (batch, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    inv_scales = jnp.full((batch,), 5.0)
    sdfs = jnp.broadcast_to(sdf, (batch,) + sdf.shape)

    render = jax.jit(
        jax.vmap(
            lambda s, p, q, i: render_depth(
                s, p, q, i, camera=camera, threshold=0.005
            )
        )
    )
    render_one = jax.jit(
        lambda s, p, q, i: render_depth(s, p, q, i, camera=camera, threshold=0.005)
    )

    # warmup / compile
    render(sdfs, positions, quats, inv_scales).block_until_ready()
    render_one(sdf, positions[0], quats[0], inv_scales[0]).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = render(sdfs, positions, quats, inv_scales)
    out.block_until_ready()
    batched_time = time.perf_counter() - t0
    renders_per_sec = batch * args.iters / batched_time

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out1 = render_one(sdf, positions[0], quats[0], inv_scales[0])
    out1.block_until_ready()
    single_time = time.perf_counter() - t0
    single_renders_per_sec = args.iters / single_time

    # full gradient pass (render + masked L1 + backward), batched
    target = render(sdfs, positions, quats, inv_scales)

    def loss_fn(p):
        est = render(sdfs, p, quats, inv_scales)
        m = (est > 0) & (target > 0)
        return jnp.sum(jnp.abs(est - target) * m)

    grad_fn = jax.jit(jax.grad(loss_fn))
    grad_fn(positions).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(max(args.iters // 2, 1)):
        g = grad_fn(positions)
    g.block_until_ready()
    grad_time = time.perf_counter() - t0
    fwd_bwd_per_sec = batch * max(args.iters // 2, 1) / grad_time

    # refinement iterations/sec (render + losses + backward + Adam, scanned)
    import optax
    from sdfest_tpu.ops import pointset
    from sdfest_tpu.pipeline import losses as L

    depth_target = target[0]
    points, point_mask = pointset.depth_to_pointcloud_dense(depth_target, camera)
    optimizer = optax.adam(1e-3)

    def refine(state):
        opt_state = optimizer.init(state)

        def step(carry, _):
            state, opt_state = carry

            def loss(s):
                est = render_one(sdf, s["position"], s["orientation"], s["inv_scale"])
                return L.depth_l1_loss(depth_target, est) + 3.0 * L.masked_pc_loss(
                    points,
                    point_mask,
                    s["position"],
                    s["orientation"],
                    1.0 / s["inv_scale"],
                    sdf,
                )

            l, g = jax.value_and_grad(loss)(state)
            updates, opt_state = optimizer.update(g, opt_state)
            state = optax.apply_updates(state, updates)
            return (state, opt_state), l

        (state, _), ls = jax.lax.scan(
            step, (state, opt_state), None, length=args.refine_iters
        )
        return state, ls

    state0 = {
        "position": positions[0] + 0.02,
        "orientation": quats[0],
        "inv_scale": inv_scales[0],
    }
    refine_jit = jax.jit(refine)
    refine_jit(state0)[1].block_until_ready()
    t0 = time.perf_counter()
    _, ls = refine_jit(state0)
    ls.block_until_ready()
    refine_time = time.perf_counter() - t0
    refine_iters_per_sec = args.refine_iters / refine_time

    import jax as _jax

    result = {
        "metric": "depth_renders_per_sec_640x480_64cube_batched"
        if not args.quick
        else "depth_renders_per_sec_quick",
        "value": round(renders_per_sec, 2),
        "unit": "renders/s",
        "vs_baseline": round(renders_per_sec / single_renders_per_sec, 3),
        "detail": {
            "batch": batch,
            "single_renders_per_sec": round(single_renders_per_sec, 2),
            "fwd_bwd_renders_per_sec": round(fwd_bwd_per_sec, 2),
            "refine_iters_per_sec": round(refine_iters_per_sec, 2),
            "device": str(_jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
