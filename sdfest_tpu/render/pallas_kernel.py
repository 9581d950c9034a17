"""Pallas TPU sphere-tracing kernels: MXU-based trilinear sampling.

Why this design: XLA's generic gather/scatter serializes on TPU (~80 ns per
element measured on v5e — a single 307k-point trilinear sample costs ~25 ms),
so the reference CUDA kernel's per-thread random voxel access
(sdf_renderer_cuda.cu:217-239) has no direct TPU analogue, and Mosaic's
``dynamic_gather`` only shuffles within one vreg.  Instead trilinear
interpolation is refactored into dense MXU work.  With 2-sparse lerp rows
``Xx/Xy/Wz`` (one-hot pairs carrying the interpolation weights):

    value[q] = sum_i Xx[q,i] * M[q,i],
    M = A @ Tt,   A[q, j*64+k] = Xy[q,j] * Wz[q,k],  Tt[j*64+k, i] = sdf[i,j,k]

- ``A`` is a batched outer product (one VPU broadcast-multiply),
- ``M`` is ONE deep (K=4096) MXU matmul per query tile,
- the final x-contraction is a 64-lane row reduction.

Gradients reuse the same structure: d/dx swaps ``Xx`` for its derivative
row (free — same ``M``); d/dy and d/dz swap a factor inside ``A`` (two more
matmuls).  The backward *scatter* is the transpose: ``grad_Tt += A^T @
(Xx * cot)`` — a dense matmul accumulated over sequential grid steps; no
atomics, fully deterministic (replacing the CUDA atomicAdd backward,
sdf_renderer_cuda.cu:373-466).

The sphere-trace march runs per 16x16-pixel tile with an early-exit
``while_loop``; tiles whose rays all missed the OBB (the common case) never
touch the MXU.  OBB slab test, ray setup and rotation are cheap dense XLA
ops outside the kernel.  All kernels skip fully-masked tiles (hit pixels
cluster spatially).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdfest_tpu.ops.camera import Camera
from sdfest_tpu.ops import quaternion
from sdfest_tpu.render.xla import _obb_intersect

RES = 64
Q = 256  # queries per tile for the standalone sampling/scatter kernels
TILE = 16  # pixel tile edge for the march.  16x16 = 256 rays per tile:
# deeper MXU matmuls (M=256) beat the finer early-exit granularity of 8x8
# once culling + the bf16 fast path cheapen the wasted lock-step rays
# (measured 20.7 -> 17.3 ms on the bench sphere, 16.1 -> 14.3 ms on a mug)
QM = TILE * TILE  # rays per march tile
import os as _os0
WJ = int(_os0.environ.get("SDFEST_WJ", 16))  # y-cell window for the windowed fine sample: rays in a march tile
# are spatially coherent, so the active rays' trilinear y-cells span <= WJ
# cells in >90% of fine steps (measured on sphere/mug sweeps); those steps
# slice a (WJ*res, res) table window with pl.ds, shrinking both the lerp-row
# build and the matmul contraction 4x.  Wide steps fall back to the full
# table inside a lax.cond.
WZ = int(_os0.environ.get("SDFEST_WZ", 16))  # z-cell window for the two-axis
# (y,z) fine-sample tier: when the active rays' z-cells also fit a WZ-cell
# aligned band, the march contracts against a (WJ*WZ, res) slice of the
# shifted-variant table (:func:`zwin_table`) — a 4x narrower row build and
# 4x shallower matmul than the y-window tier.
_ZSHIFT = int(_os0.environ.get("SDFEST_ZSHIFT", 8))  # z-band start
# alignment (multiple of the fp32 sublane tile); variants overlap by
# WZ - _ZSHIFT cells so any klo maps to a covering aligned band.
# _ZSHIFT=4 (13 variants, 3.25 MB) measured ~1% faster but blows the
# 16 MiB scoped-vmem budget under the sequential-vmap lax.map wrapper.
_ZWIN = int(_os0.environ.get("SDFEST_ZWIN", 1))  # A/B switch for the tier
_STALE = int(_os0.environ.get("SDFEST_STALE", 0))  # stale-decision software
# pipelining (v2 march): carry the branch-select/window scalars in the
# while carry, computed mid-iteration so their reduce->scalar latency
# overlaps the remaining sub-steps' vector work.  MEASURED DEAD END on
# v5e (sphere 10.7 -> 16.8 ms, mug 12.9 -> 19.6): duplicating the decide
# block into every switch branch spills, and the scalar latency it hides
# is smaller than the spill cost.  Kept as an A/B knob, default OFF.
NVZ = (RES - WZ) // _ZSHIFT + 1  # number of shifted z-band variants
_DECIDE_EVERY = int(_os0.environ.get("SDFEST_DECIDE_EVERY", 1))  # v2 march:
# run the branch-select/window decision only every Nth while iteration and
# carry (sel, j0, k0) in between.  Stale decisions are SAFE (any branch is
# safe for any ray state; stale windows only stall rays via the valid
# predicates, and the coarse branch always refreshes its bound before
# stepping) — this trades decide cost (a coarse lookup + ~6 reduce->scalar
# syncs) against extra stall iterations from staler windows.  MEASURED
# DEAD END on v5e (=2: sphere 9.5 -> 12.3 ms, mug 11.2 -> 14.3): the three
# extra scalar carries + per-iteration cond cost more than the skipped
# decides save.  Kept as an A/B knob, default 1 (off).
_PREBOUND = int(_os0.environ.get("SDFEST_PREBOUND", 0))  # v2 march: take
# this many far-guarded coarse bound sub-steps BEFORE the while loop
# (trace-time unrolled): rays start at the OBB shell, so the first loop
# iterations are usually bound steps — hoisting them skips their
# decide/switch/cond overhead entirely.
_MXRED = int(_os0.environ.get("SDFEST_MXRED", 0))  # v2 march: compute the
# four window-bound reduces via ONE (1, Q) @ (Q, 2*res) MXU column-sum of
# an active-cell presence field + single-vreg lane min/max extractions,
# instead of four layout-hostile (Q, 1) column reduces.  MEASURED on v5e:
# neutral on the mug, ~7% SLOWER on the sphere — the (Q, 2*res) presence
# build + M=1 matmul costs what the column reduces save; the decide
# reduces are NOT the per-iteration bottleneck.  A/B knob, default off.
_ALIVE_CARRY = int(_os0.environ.get("SDFEST_ALIVE_CARRY", 0))  # v2 march:
# carry the active-ray count as a while-carry scalar so the loop cond is
# scalar-only (the reduce moves to the body end); A/B knob for whether the
# cond-side reduce latency is on the critical path.
_NOFALLBACK = int(_os0.environ.get("SDFEST_NOFALLBACK", 0))  # v2 march:
# drop the y-tier/full-table fallback branches and the window-validity
# (jhi/khi) reduces: near tiles ALWAYS take the yz-window branch, anchored
# at the lowest active (y, z) cells; rays outside the window stall via the
# valid predicate until the window walks onto them (the anchor rays always
# progress, so no livelock).  Halves decide's reduce->scalar syncs and
# shrinks the switch to 2 branches, at the cost of stall iterations on
# tiles whose active rays span more than a window.  MEASURED DEAD END on
# v5e (sphere 9.5 -> 11.6 ms, mug 11.2 -> 13.3): the stall iterations on
# wide tiles cost ~2 ms, far more than the two skipped reduces save.
# Kept as an A/B knob, default off.
_UNROLL = int(_os0.environ.get("SDFEST_UNROLL", 3))  # fine sub-steps per while iteration in the v2 culling march:
# amortizes the per-iteration scalar-sync/branch overhead (~6-9 us on v5e,
# larger than the sample matmul) across several dependent samples
_UNROLL_COARSE = int(_os0.environ.get("SDFEST_UNROLL_COARSE", 2))  # bound
# sub-steps per coarse iteration (same overhead-amortization logic;
# lookups are ~4x cheaper than fine samples)
_UNROLL_AUX = int(_os0.environ.get("SDFEST_UNROLL_AUX", 2))  # sub-steps in
# the corridor-tracking (aux) march: the five corridor carries raise VMEM
# pressure, and 3 sub-steps blew the DEFAULT 16 MiB scoped-vmem budget
# (measured 17.01M) — re-testable since the 64 MiB ceiling shipped
# per-ray auto-over-relaxation (v2 culling march, ``adaptive``): initial /
# growth / cap of the overstep factor omega.  The cap stays below 2 because
# the overlap certificate for a constant field along the ray (the graze-band
# regime) holds exactly up to omega = 2; 1.9 leaves certification margin so
# grazing rays almost never revert.
_os = _os0

_OMEGA_INIT = float(_os.environ.get("SDFEST_OMEGA_INIT", 1.4))
_OMEGA_GROW = float(_os.environ.get("SDFEST_OMEGA_GROW", 0.2))
_OMEGA_MAX = float(_os.environ.get("SDFEST_OMEGA_MAX", 1.9))
NC = int(_os.environ.get("SDFEST_NC", 16))  # coarse culling grid resolution per axis
# Second-level mid-resolution bound table (measured A/B, v5e-1 640x480
# 16-pose sweep): the coarse branch's bound-refresh steps look up an
# NCM^3 min-pool table instead of the NC^3 one — 2x finer bounds in the
# near field, so approaching rays take up to 2x longer certified steps
# before flipping to fine sampling.  The every-iteration DECIDE lookup
# stays at NC=16: widening THAT to 32 regressed the mug render 12.3 ->
# 16.1 ms (the (Q, nc^2) one-hot build is on the critical path of every
# iteration), while the refresh-only mid lookup rides the coarse branch
# only.  Default set by the same A/B (see NOTES.md).
NCM = int(_os.environ.get("SDFEST_NCM", 32))
_MIDLEVEL = _os.environ.get("SDFEST_MIDLEVEL", "0") == "1"
# conservative slack subtracted from the coarse min-pool: covers fp noise and
# the (clamped) linear extrapolation just outside the volume boundary
_COARSE_MARGIN = 1e-4

# Scoped-VMEM ceiling for the pallas calls: the default 16 MiB limit is an
# allocator cap, not the hardware (v5e has 128 MiB of VMEM).  The fused
# sample-grad kernel's three (QG, res^2) A-matrices plus the fine + zwin
# tables legitimately need ~17-18 MiB under the sequential-vmap lax.map
# wrapper; 64 MiB leaves Mosaic full double-buffering headroom while still
# bounding runaway allocations.
_VMEM_LIMIT = int(_os.environ.get("SDFEST_VMEM_LIMIT", 64 * 1024 * 1024))
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)

# Mosaic supports DEFAULT (single bf16 pass, ~8e-3 relative — too coarse
# for SDF values near the surface) or HIGHEST (fp32 contract); use fp32
_MM_PRECISION = jax.lax.Precision.HIGHEST
# one-pass-bf16 sampling error bound, relative to the max |value| among the
# interpolation corners: inputs round to bf16 (rel 2^-9 each), accumulation
# is fp32, so |error| <= ~4e-3 * max|corner|; 6e-3 adds safety margin
_BF16_ERR = 6e-3


def _resolve_interpret(interpret) -> bool:
    """None -> interpret off-TPU (CPU tests), compiled on TPU."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _sequential_vmap(fn, *args):
    """Call ``fn(*args)``; under ``jax.vmap``, run batch elements one by one.

    Compiled Mosaic has miscompiled batched ``pallas_call`` programs of the
    march kernel: ``vmap`` adds a leading grid dimension, and on real TPU
    both dynamic (active-count-sized) grids and the adaptive-relaxation
    while carries produced wrong depths (|ddepth| up to 0.5 on ~3% of
    pixels) while every unbatched compile — and interpret mode — is exact
    (tests/test_tpu_compiled.py::test_compiled_render_under_vmap guards
    this).  One 640x480 render already saturates a v5e chip (hypothesis
    scaling measured flat from N=1 to 8), so lowering ``vmap`` to a
    ``lax.map`` over unbatched calls is performance-neutral and removes the
    whole batched-Mosaic hazard class; only the pallas calls serialize —
    surrounding vmapped ops (losses, optimizer) stay batched.
    """
    wrapped = jax.custom_batching.custom_vmap(fn)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, *bargs):
        def elem(i):
            sliced = [
                jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
                if b else a
                for a, b in zip(bargs, in_batched)
            ]
            return fn(*sliced)

        out = jax.lax.map(elem, jnp.arange(axis_size))
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return wrapped(*args)


def sdf_to_table(sdf: jax.Array) -> jax.Array:
    """(res, res, res) SDF -> contraction table Tt[j*res+k, i] = sdf[i,j,k]."""
    res = sdf.shape[0]
    return jnp.transpose(sdf.reshape(res, res * res), (1, 0))


def table_grad_to_sdf(grad_table: jax.Array, res: int = RES) -> jax.Array:
    """Map a gradient w.r.t. Tt back to the (res, res, res) layout."""
    return jnp.transpose(grad_table, (1, 0)).reshape(res, res, res)


def coarse_min_table(sdf: jax.Array, nc: int = NC) -> jax.Array:
    """Conservative coarse bound table for culling + mixed-precision march.

    Column block ``[:, 0:nc]``: ``C[i, j, k]`` is a lower bound on the
    trilinear interpolant at every point whose clamped coarse index is
    ``(i, j, k)``: the minimum over all fine vertices any such interpolation
    can touch (trilinear values are bounded below by the minimum of their 8
    cell corners), minus a small slack (:data:`_COARSE_MARGIN`).  Column
    block ``[:, nc:2nc]``: ``A[i, j, k]``, the maximum |value| over the same
    window — the scale of the one-pass-bf16 sampling error used by the
    mixed-precision march.  Layout ``Ttc[j*nc + k, i (| nc + i)]`` (matching
    :func:`sdf_to_table`).
    """
    res = sdf.shape[0]
    # coarse cell i covers fine coordinates u in [i, i+1] * (res-1)/nc; the
    # trilinear corners for u are floor(u) and floor(u)+1 (base clamped)
    i = jnp.arange(nc)
    lo = jnp.floor(i * (res - 1) / nc).astype(jnp.int32)
    hi = jnp.minimum(
        jnp.floor((i + 1) * (res - 1) / nc).astype(jnp.int32) + 1, res - 1
    )
    v = jnp.arange(res)
    m = (v[None, :] >= lo[:, None]) & (v[None, :] <= hi[:, None])  # (nc, res)

    def pool(vol, combine, fill):
        big = jnp.asarray(fill, sdf.dtype)
        t1 = combine(jnp.where(m[:, :, None, None], vol[None], big), 1)
        t2 = combine(jnp.where(m[None, :, :, None], t1[:, None], big), 2)
        return combine(jnp.where(m[None, None, :, :], t2[:, :, None, :], big), 3)

    c = pool(sdf, jnp.min, jnp.inf) - _COARSE_MARGIN  # (nc, nc, nc)
    a = pool(jnp.abs(sdf), jnp.max, 0.0)
    stacked = jnp.concatenate([c, a], axis=0)  # (2*nc, nc, nc) over axis i
    return jnp.transpose(stacked.reshape(2 * nc, nc * nc), (1, 0))


def zwin_table(sdf: jax.Array) -> jax.Array:
    """Shifted z-band variant table for the two-axis (y,z) window tier.

    Variant ``v`` covers fine z-cells ``[v*_ZSHIFT, v*_ZSHIFT + WZ)``; row
    ``v*(res*WZ) + j*WZ + kr`` holds ``sdf[:, j, v*_ZSHIFT + kr]`` along
    lanes ``i``.  A (y, z) window with an _ZSHIFT-aligned z start is then
    ONE contiguous, sublane-aligned ``pl.ds`` row slice of ``WJ*WZ`` rows —
    a rank-2 construct Mosaic compiles reliably.  (Rank-3 table refs were
    probed on v5e and are a hazard class: leading-dim dynamic slices
    miscompile silently and two-axis slices SIGABRT the compiler.)
    """
    res = sdf.shape[0]
    bands = [
        jnp.transpose(sdf[:, :, v * _ZSHIFT:v * _ZSHIFT + WZ], (1, 2, 0))
        for v in range(NVZ)
    ]
    return jnp.concatenate(bands, axis=0).reshape(NVZ * res * WZ, res)


def _one_hot_pair(base: jax.Array, frac: jax.Array, res: int) -> jax.Array:
    """(Q, 1) base/frac -> 2-sparse lerp row (Q, res)."""
    q = base.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (q, res), 1)
    b = base.astype(jnp.int32)
    return jnp.where(iota == b, 1.0 - frac, 0.0) + jnp.where(
        iota == b + 1, frac, 0.0
    )


def _lerp_pair_tent(xf: jax.Array, iota_f: jax.Array) -> jax.Array:
    """Tent-form lerp pair: ``max(0, 1 - |iota_f - xf|)`` (arithmetic build).

    One fewer VPU op per factor than the compare+select pair build
    (sub/abs/rsub/max vs eq/sel/eq/sel/add) — measurable because the march
    spends most of its time BUILDING (Q, K) lerp rows.  Semantics caveats:

    - ``xf = base + frac`` reconstitutes the cell coordinate, so weights
      carry ~1 ulp-of-``res`` (~4e-6) rounding vs the exact pair — within
      march stepping noise, NOT bitwise-equal to the XLA sampler.
    - The tent is ZERO outside ``[base-1, base+1]``: no linear
      extrapolation.  Only safe for MARCH samples (points certified inside
      the volume by the OBB interval); the loss/VJP sample kernels must
      keep the compare-form pair (:func:`_one_hot_pair`) because their
      query points can sit outside the volume where the reference/XLA
      semantics are constant-slope extrapolation.
    """
    return jnp.maximum(0.0, 1.0 - jnp.abs(iota_f - xf))


def _d_one_hot_pair(base: jax.Array, res: int) -> jax.Array:
    """Derivative of the lerp row w.r.t. the fraction: -1 @ base, +1 @ base+1."""
    q = base.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (q, res), 1)
    b = base.astype(jnp.int32)
    ones = jnp.ones((q, 1), jnp.float32)
    return jnp.where(iota == b, -ones, 0.0) + jnp.where(iota == b + 1, ones, 0.0)


def _base_frac(coord: jax.Array, res: int) -> Tuple[jax.Array, jax.Array]:
    """Clamped base index and cell fraction for one normalized coordinate."""
    scaled = (coord + 1.0) * (res - 1) * 0.5
    base = jnp.clip(jnp.floor(scaled), 0, res - 2)
    return base, scaled - base


def _jk_iota(q: int, res: int):
    """Loop-invariant (j,) lane index field for (q, res^2) rows."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (q, res * res), 1)
    j_idx = iota // res
    return j_idx, None


def _pair_product_row(
    by: jax.Array,
    fy_w0: jax.Array,
    fy_w1: jax.Array,
    bz: jax.Array,
    fz_w0: jax.Array,
    fz_w1: jax.Array,
    res: int,
    jk=None,
) -> jax.Array:
    """Outer product of two 2-sparse rows, built directly at (Q, res^2).

    Row q has weight ``wy(j) * wz(k)`` at lane ``j*res + k`` where wy is
    ``fy_w0`` at ``by`` / ``fy_w1`` at ``by+1`` (same for z).  Built with 2D
    iota arithmetic — Mosaic cannot reshape a rank-3 (Q, res, res) outer
    product into lanes.  Pass precomputed ``jk`` index fields to hoist the
    integer division out of marching loops.
    """
    q = by.shape[0]
    j_idx, _ = _jk_iota(q, res) if jk is None else jk
    byi = by.astype(jnp.int32)
    # y factor: a 64-lane BLOCK one-hot over the wide row (built with lane
    # compares); z factor: a narrow (Q, res) one-hot tiled across the row
    # with pltpu.repeat (pure data movement -- tile-style semantics)
    u = jnp.where(j_idx == byi, fy_w0, 0.0) + jnp.where(j_idx == byi + 1, fy_w1, 0.0)
    bzi = bz.astype(jnp.int32)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (q, res), 1)
    v64 = jnp.where(k_iota == bzi, fz_w0, 0.0) + jnp.where(
        k_iota == bzi + 1, fz_w1, 0.0
    )
    v = pltpu.repeat(v64, res, axis=1)
    return u * v


def _outer_lerp(by, fy, bz, fz, res: int, jk=None) -> jax.Array:
    """A[q, j*res+k] = lerp_y[q,j] * lerp_z[q,k] (value weights)."""
    return _pair_product_row(by, 1.0 - fy, fy, bz, 1.0 - fz, fz, res, jk)


def _bases_fracs(pts: jax.Array, res: int):
    bx, fx = _base_frac(pts[:, 0:1], res)
    by, fy = _base_frac(pts[:, 1:2], res)
    bz, fz = _base_frac(pts[:, 2:3], res)
    return (bx, by, bz), (fx, fy, fz)


def _win_iota(q: int, res: int):
    """Loop-invariant lane//res field for the (q, WJ*res) windowed rows."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (q, WJ * res), 1)
    return iota // res



def _zwin_lane_fields(q: int):
    """Loop-invariant (lane // WZ, lane % WZ) fields for (q, WJ*WZ) rows."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, WJ * WZ), 1)
    jzw = lane // WZ
    return jzw, lane - jzw * WZ


def _fine_sample(
    tt_ref,
    pts: jax.Array,
    active: jax.Array,
    res: int,
    jk,
    jkw,
    precision=_MM_PRECISION,
    ttz_ref=None,
) -> jax.Array:
    """Trilinear sample with dynamically sliced cell windows.

    When the active rays' y base cells span <= :data:`WJ` cells (the common
    case for a spatially coherent march tile), contract against the
    ``tt_ref[j0*res : (j0+WJ)*res]`` window — a 4x shallower matmul and 4x
    narrower lerp-row build.  With ``ttz_ref`` (a :func:`zwin_table`), a
    two-axis (y, z) window tier runs first when the z cells also fit an
    aligned WZ band: one contiguous ``WJ*WZ``-row slice, another 4x
    narrower.  Falls back to the full-table :func:`_sample_tile` inside
    ``lax.cond`` otherwise.  Values for in-window rays are the same sums as
    the full path (up to contraction order); out-of-window *inactive* rays
    produce 0, which every caller masks with ``active``.
    """
    (bx, by, bz), (fx, fy, fz) = _bases_fracs(pts, res)
    byi = by.astype(jnp.int32)
    act = active > 0.0
    jlo = jnp.min(jnp.where(act, byi, res))
    jhi = jnp.max(jnp.where(act, byi, -1))
    ok = jnp.logical_and(jhi - jlo <= WJ - 2, jhi >= 0)
    xx = _one_hot_pair(bx, fx, res)
    bzi = bz.astype(jnp.int32)
    q = pts.shape[0]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (q, res), 1)
    v64 = jnp.where(k_iota == bzi, 1.0 - fz, 0.0) + jnp.where(
        k_iota == bzi + 1, fz, 0.0
    )
    j0 = jnp.minimum(jlo, res - WJ)
    rel = byi - j0

    def win(_):
        u = jnp.where(jkw == rel, 1.0 - fy, 0.0) + jnp.where(
            jkw == rel + 1, fy, 0.0
        )
        a = u * pltpu.repeat(v64, WJ, axis=1)
        tw = tt_ref[pl.ds(j0 * res, WJ * res), :]
        m = jnp.dot(a, tw, preferred_element_type=jnp.float32,
                    precision=precision)
        return jnp.sum(m * xx, axis=1, keepdims=True)

    def full(_):
        j_idx, _ = _jk_iota(q, res) if jk is None else jk
        u = jnp.where(j_idx == byi, 1.0 - fy, 0.0) + jnp.where(
            j_idx == byi + 1, fy, 0.0
        )
        a = u * pltpu.repeat(v64, res, axis=1)
        m = jnp.dot(a, tt_ref[:], preferred_element_type=jnp.float32,
                    precision=precision)
        return jnp.sum(m * xx, axis=1, keepdims=True)

    y_tier = lambda _: jax.lax.cond(ok, win, full, 0)
    if ttz_ref is None or not _ZWIN:
        return y_tier(0)

    k0, kz_ok = _zwindow_bounds(bzi, act, res)
    yz_ok = jnp.logical_and(ok, kz_ok)
    jzw, kzw = _zwin_lane_fields(q)

    def yz(_):
        row0 = (k0 // _ZSHIFT) * (res * WZ) + j0 * WZ
        tw = ttz_ref[pl.ds(row0, WJ * WZ), :]
        rk = bzi - k0
        u = jnp.where(jzw == rel, 1.0 - fy, 0.0) + jnp.where(
            jzw == rel + 1, fy, 0.0
        )
        vz = jnp.where(kzw == rk, 1.0 - fz, 0.0) + jnp.where(
            kzw == rk + 1, fz, 0.0
        )
        m = jnp.dot(u * vz, tw, preferred_element_type=jnp.float32,
                    precision=precision)
        return jnp.sum(m * xx, axis=1, keepdims=True)

    return jax.lax.cond(yz_ok, yz, y_tier, 0)


def _sample_tile(tt_ref, pts: jax.Array, res: int, jk=None,
                 precision=_MM_PRECISION) -> jax.Array:
    """Trilinear-sample ``pts`` (Q, 3) against the resident table; (Q, 1)."""
    (bx, by, bz), (fx, fy, fz) = _bases_fracs(pts, res)
    xx = _one_hot_pair(bx, fx, res)
    a = _outer_lerp(by, fy, bz, fz, res, jk)
    m = jnp.dot(a, tt_ref[:], preferred_element_type=jnp.float32,
                precision=precision)  # (Q, res)
    return jnp.sum(m * xx, axis=1, keepdims=True)


def _sample_grad_tile(tt_ref, pts: jax.Array, res: int):
    """Value and spatial gradient; ((Q, 1), (Q, 3)).

    Gradient w.r.t. the normalized coordinates (chain factor ``(res-1)/2``
    included), matching autodiff of the XLA sampler: piecewise-constant
    base cells, constant-slope fraction everywhere (including the clamped
    extrapolation region).
    """
    (bx, by, bz), (fx, fy, fz) = _bases_fracs(pts, res)
    xx = _one_hot_pair(bx, fx, res)
    dxx = _d_one_hot_pair(bx, res)
    s = (res - 1) * 0.5
    ones = jnp.ones_like(fy)

    m = jnp.dot(_outer_lerp(by, fy, bz, fz, res), tt_ref[:],
                preferred_element_type=jnp.float32, precision=_MM_PRECISION)
    value = jnp.sum(m * xx, axis=1, keepdims=True)
    gx = jnp.sum(m * dxx, axis=1, keepdims=True) * s
    a_dy = _pair_product_row(by, -ones, ones, bz, 1.0 - fz, fz, res)
    m_dy = jnp.dot(a_dy, tt_ref[:],
                   preferred_element_type=jnp.float32, precision=_MM_PRECISION)
    gy = jnp.sum(m_dy * xx, axis=1, keepdims=True) * s
    a_dz = _pair_product_row(by, 1.0 - fy, fy, bz, -ones, ones, res)
    m_dz = jnp.dot(a_dz, tt_ref[:],
                   preferred_element_type=jnp.float32, precision=_MM_PRECISION)
    gz = jnp.sum(m_dz * xx, axis=1, keepdims=True) * s
    return value, jnp.concatenate([gx, gy, gz], axis=1)


def _coarse_lookup(ttc_ref, pts: jax.Array, nc: int, need_max: bool = True):
    """Piecewise-constant lookup of the coarse bound tables; 2 x (Q, 1).

    Same one-hot-matmul factorization as :func:`_sample_tile`, but with a
    single COMBINED-INDEX one-hot (no interpolation): since the lookup is
    piecewise constant, the (y, z) row selector is one compare of the wide
    lane iota against ``ciy*nc + ciz`` — no separate y/z factor builds, no
    ``pltpu.repeat``, no factor product.  Returns (lower bound, max
    |value| in the cell window); pass ``need_max=False`` on non-bf16 paths
    to skip the second extraction.
    """
    q = pts.shape[0]
    ci = jnp.clip(jnp.floor((pts + 1.0) * (nc * 0.5)), 0, nc - 1).astype(
        jnp.int32
    )
    cix, ciy, ciz = ci[:, 0:1], ci[:, 1:2], ci[:, 2:3]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (q, nc), 1)
    oh_x = jnp.where(iota_n == cix, 1.0, 0.0)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (q, nc * nc), 1)
    a = jnp.where(r_iota == ciy * nc + ciz, 1.0, 0.0)  # (Q, nc^2)
    m = jnp.dot(a, ttc_ref[:], preferred_element_type=jnp.float32,
                precision=_MM_PRECISION)  # (Q, 2nc)
    cmin = jnp.sum(m[:, :nc] * oh_x, axis=1, keepdims=True)
    if not need_max:
        return cmin, None
    amax = jnp.sum(m[:, nc:] * oh_x, axis=1, keepdims=True)
    return cmin, amax


# ---------------------------------------------------------------------------
# sphere-trace march
# ---------------------------------------------------------------------------


def _march_kernel(s_ref, *refs, **kwargs):
    """Prefetch-guarded march: grid steps map to active tiles only.

    ``s_ref`` (scalar prefetch) holds ``[active_count, tile_id_0, ...]``;
    the call site's index maps route grid step ``t < active_count`` to the
    ``t``-th active tile and every later step to the last active tile's
    index — Mosaic elides block DMAs when consecutive grid steps map to the
    same block, so the tail steps cost only this no-op guard (measured
    ~2.5 us per skipped tile otherwise, ~3 ms for a mostly-off-screen
    640x480 grid).  Inactive tiles' output blocks stay uninitialized; the
    wrapper selects them to zero.
    """

    @pl.when(pl.program_id(0) < s_ref[0])
    def _():
        _march_kernel_body(*refs, **kwargs)


def _obb_interval_tile(dirs_o: jax.Array, origin_o: jax.Array, scale):
    """Per-tile OBB slab test in the object frame; (hit, t_min, t_max).

    Replicates :func:`sdfest_tpu.render.xla._obb_intersect` expression by
    expression so the in-kernel ray intervals match the XLA-side ones used
    to build the compaction index (the object-frame direction IS
    ``dirs @ axes.T`` and ``e = axes @ position = -origin_o``).  Computing
    this in-kernel (once per tile, ~30 vector ops on (Q, 3)) removes three
    per-pose tiled operands and their transpose/copy chains from the XLA
    prologue.
    """
    e = -origin_o  # (1, 3)
    f = dirs_o  # (Q, 3)
    parallel = jnp.abs(f) <= 1e-20
    safe_f = jnp.where(parallel, 1.0, f)
    t_1 = (e + scale) / safe_f
    t_2 = (e - scale) / safe_f
    lo = jnp.where(parallel, -jnp.inf, jnp.minimum(t_1, t_2))
    hi = jnp.where(parallel, jnp.inf, jnp.maximum(t_1, t_2))
    t_min = jnp.maximum(jnp.max(lo, axis=1, keepdims=True), -1e-10)
    t_max = jnp.min(hi, axis=1, keepdims=True)
    miss_parallel = jnp.max(
        jnp.where(parallel & (jnp.abs(e) > scale), 1.0, 0.0),
        axis=1,
        keepdims=True,
    )
    hit = (
        (1.0 - miss_parallel)
        * jnp.where(t_min <= t_max, 1.0, 0.0)
        * jnp.where(t_max >= 0.0, 1.0, 0.0)
    )
    return hit, jnp.maximum(t_min, 0.0), t_max


def _march_kernel_body(
    tt_ref,
    ttc_ref,  # (nc^2, nc) coarse culling table (used when culling)
    ttm_ref,  # (NCM^2, 2*NCM) mid-level bound table (dummy unless _MIDLEVEL)
    ttz_ref,  # (NVZ*res*WZ, res) shifted z-band table (v2 yz-window tier)
    dx_ref,  # (1, Q, 1) camera-frame ray direction x (camera-constant)
    dy_ref,  # (1, Q, 1) camera-frame ray direction y (camera-constant)
    dz_ref,  # (1, Q, 1) camera-frame d_z per ray (camera-constant)
    rot_ref,  # (3, 3) object rotation matrix
    origin_ref,  # (1, 3) object-frame ray origin
    scalars_ref,  # (1, 2): [inv_scale, threshold]
    *rest_refs,  # warm: t_init, skip inputs; then depth out (+ aux outs)
    res: int,
    max_steps: int,
    relaxation: float = 1.0,
    culling: bool = False,
    bf16: bool = False,
    aux: bool = False,
    warm: bool = False,
    adaptive: bool = True,
):
    sc = scalars_ref[:]
    inv_scale = sc[:, 0:1]
    threshold = sc[:, 1:2]
    scale = 1.0 / inv_scale
    origin_o = origin_ref[:]
    dz = dz_ref[0]
    # rotate the camera-constant ray directions into the object frame once
    # per tile: dirs_o[q, a] = sum_c dirs[q, c] * rot[c, a].  The camera
    # direction planes never change with the pose, so the XLA prologue's
    # per-pose (H, W, 3) rotation + tile transpose disappears (XLA hoists
    # the constant tiled planes out of refinement scans).
    rot = rot_ref[:]
    dirs_o = (
        dx_ref[0] * rot[0:1, :]
        + dy_ref[0] * rot[1:2, :]
        + dz * rot[2:3, :]
    )
    if warm:
        tinit_ref, skip_ref, depth_ref, *aux_refs = rest_refs
    else:
        tinit_ref, skip_ref = None, None
        depth_ref, *aux_refs = rest_refs

    hit, t_min, t_max = _obb_interval_tile(dirs_o, origin_o, scale)
    t0 = t_min
    if warm:
        t_init = tinit_ref[0]
        t0 = jnp.where(t_init >= 0.0, jnp.maximum(t_min, t_init), t_min)
    # float mask: Mosaic cannot carry i1 vectors through scf.while
    active0 = hit * jnp.where(t0 < t_max, 1.0, 0.0)
    if warm:
        active0 = active0 * jnp.where(skip_ref[0] <= 0.0, 1.0, 0.0)

    jk = _jk_iota(dirs_o.shape[0], res)  # hoisted out of the march loop
    jkw = _win_iota(dirs_o.shape[0], res)  # windowed-row lane field

    if aux and (relaxation > 1.0 or not culling):
        raise ValueError("aux outputs require the culling march variant")
    if relaxation <= 1.0 and culling and aux and not bf16:
        # v2 (windowed + unrolled) culling march with ray-corridor tracking
        # for temporal coherence — the default aux path.  Same structure as
        # the non-aux v2 march below (one coarse/fine/window decision per
        # while iteration, sub-steps with only vector-predicated updates)
        # plus the corridor bookkeeping of the bf16 aux variant (see its
        # docstring for the recorded fields); corridor updates are pure
        # vector ops so they ride the sub-steps for free.
        def cond(carry):
            _, _, active, step = carry[:4]
            return jnp.logical_and(jnp.sum(active) > 0.0, step < max_steps)

        k_iota = jax.lax.broadcasted_iota(
            jnp.int32, (dirs_o.shape[0], res), 1
        )

        def corridor(v, t, sampled, cor):
            v_prev, t_prev, min_dip, v0, have = cor
            dip = (v_prev + v - (t - t_prev)) * 0.5
            seen = sampled * have
            min_dip = jnp.where(seen > 0.0, jnp.minimum(min_dip, dip), min_dip)
            v0 = jnp.where(sampled * (1.0 - have) > 0.0, v, v0)
            v_prev = jnp.where(sampled > 0.0, v, v_prev)
            t_prev = jnp.where(sampled > 0.0, t, t_prev)
            have = jnp.where(sampled > 0.0, 1.0, have)
            return (v_prev, t_prev, min_dip, v0, have)

        def body(carry):
            t, depth, active, step, *cor = carry
            cor = tuple(cor)
            pts = (origin_o + t * dirs_o) * inv_scale
            cd, _ = _coarse_lookup(ttc_ref, pts, NC, need_max=False)
            cd = cd * scale
            near = jnp.sum(
                active * jnp.where(cd < threshold * t + 1e-5, 1.0, 0.0)
            )
            byi = _base_frac(pts[:, 1:2], res)[0].astype(jnp.int32)
            # no full-table fallback here (unlike the non-aux v2 march):
            # the five corridor carries leave no VMEM headroom for the
            # (Q, res^2) full rows, and the window-stall mechanism already
            # guarantees progress — the window is anchored at the lowest
            # active y-cell, so at least those rays sample every iteration
            # and the window walks upward across a wide tile
            # low anchor: this march has NO full-table fallback — progress
            # relies on the lowest active rays always being in-window
            j0, _ = _window_bounds(byi, active > 0.0, res, center=False)
            sel = jnp.where(near > 0.0, 1, 0)

            def substeps(t, depth, active, cor, sample):
                for _ in range(_UNROLL_AUX):
                    p = (origin_o + t * dirs_o) * inv_scale
                    dist, valid = sample(p)
                    upd = active * valid
                    cor = corridor(dist, t, upd, cor)
                    hit = upd * jnp.where(dist < threshold * t, 1.0, 0.0)
                    depth = jnp.where(hit > 0.0, -t * dz, depth)
                    active = active * (1.0 - hit)
                    t = jnp.where(active * valid > 0.0, t + dist, t)
                    active = active * jnp.where(t < t_max, 1.0, 0.0)
                return (t, depth, active) + cor

            def coarse_branch(t, depth, active, *cor):
                cor = corridor(cd, t, active, tuple(cor))
                t = jnp.where(active > 0.0, t + cd, t)
                for _ in range(_UNROLL_COARSE - 1):
                    p = (origin_o + t * dirs_o) * inv_scale
                    cd2, _ = _coarse_lookup(ttc_ref, p, NC, need_max=False)
                    cd2 = cd2 * scale
                    far = jnp.where(cd2 >= threshold * t + 1e-5, 1.0, 0.0)
                    cor = corridor(cd2, t, active * far, cor)
                    t = jnp.where(active * far > 0.0, t + cd2, t)
                return (t, depth, active) + cor

            def fine_win_branch(t, depth, active, *cor):
                tw = tt_ref[pl.ds(j0 * res, WJ * res), :]

                def sample(p):
                    (bx, by, bz), (fx, fy, fz) = _bases_fracs(p, res)
                    rel = by.astype(jnp.int32) - j0
                    valid = jnp.where(
                        jnp.logical_and(rel >= 0, rel <= WJ - 2), 1.0, 0.0
                    )
                    xx = _one_hot_pair(bx, fx, res)
                    bzi = bz.astype(jnp.int32)
                    v64 = jnp.where(k_iota == bzi, 1.0 - fz, 0.0) + jnp.where(
                        k_iota == bzi + 1, fz, 0.0
                    )
                    u = jnp.where(jkw == rel, 1.0 - fy, 0.0) + jnp.where(
                        jkw == rel + 1, fy, 0.0
                    )
                    a = u * pltpu.repeat(v64, WJ, axis=1)
                    m = jnp.dot(a, tw, preferred_element_type=jnp.float32,
                                precision=_MM_PRECISION)
                    return (
                        jnp.sum(m * xx, axis=1, keepdims=True) * scale,
                        valid,
                    )

                return substeps(t, depth, active, tuple(cor), sample)

            t, depth, active, *cor = jax.lax.switch(
                sel, [coarse_branch, fine_win_branch],
                t, depth, active, *cor,
            )
            active = active * jnp.where(t < t_max, 1.0, 0.0)
            return (t, depth, active, step + 1) + tuple(cor)

        zeros = jnp.zeros_like(t0)
        cor0 = (zeros, t0, jnp.full_like(t0, 1e9), zeros, zeros)
        t, depth, _, _, v_prev, t_prev, min_dip, v0, have = jax.lax.while_loop(
            cond, body, (t0, zeros, active0, 0) + cor0
        )
        t_ref, v0_ref, mindip_ref, vlast_ref, tlast_ref = aux_refs
        t_ref[0] = t
        v0_ref[0] = jnp.where(have > 0.0, v0, 0.0)
        mindip_ref[0] = jnp.where(have > 0.0, min_dip, 0.0)
        vlast_ref[0] = jnp.where(have > 0.0, v_prev, 0.0)
        tlast_ref[0] = t_prev
        depth_ref[0] = depth
        return
    if relaxation <= 1.0 and culling and aux:
        # culling march with ray-corridor tracking for temporal coherence.
        # Per marched ray it records, alongside the depth:
        #   t_out    — terminal t (hit t, or t at deactivation),
        #   v0       — first measured lower bound (at the march start t0),
        #   min_dip  — min over consecutive samples i of
        #              (v_i + v_{i+1} - (t_{i+1} - t_i)) / 2, a 1-Lipschitz
        #              lower bound on the field anywhere on the marched
        #              segment between samples,
        #   v_last / t_last — final sample (for the tail clearance
        #              v_last - (t_max' - t_last) past the last sample).
        # Both fine values and coarse bounds are valid lower bounds, so the
        # corridor accounts for bound steps too.
        def cond(carry):
            _, _, active, step = carry[:4]
            return jnp.logical_and(jnp.sum(active) > 0.0, step < max_steps)

        def corridor(v, t, active, cor):
            v_prev, t_prev, min_dip, v0, have = cor
            dip = (v_prev + v - (t - t_prev)) * 0.5
            seen = active * have
            min_dip = jnp.where(seen > 0.0, jnp.minimum(min_dip, dip), min_dip)
            v0 = jnp.where(active * (1.0 - have) > 0.0, v, v0)
            v_prev = jnp.where(active > 0.0, v, v_prev)
            t_prev = jnp.where(active > 0.0, t, t_prev)
            have = jnp.where(active > 0.0, 1.0, have)
            return (v_prev, t_prev, min_dip, v0, have)

        def body(carry):
            t, depth, active, step, *cor = carry
            cor = tuple(cor)
            pts = (origin_o + t * dirs_o) * inv_scale
            cd, amax = _coarse_lookup(ttc_ref, pts, NC, need_max=bf16)
            cd = cd * scale
            near = jnp.sum(
                active * jnp.where(cd < threshold * t + 1e-5, 1.0, 0.0)
            )

            def exact_step(t, depth, active, cor, dist):
                cor = corridor(dist, t, active, cor)
                hit = jnp.where(dist < threshold * t, 1.0, 0.0)
                depth = jnp.where(active * hit > 0.0, -t * dz, depth)
                active = active * (1.0 - hit)
                t = jnp.where(active > 0.0, t + dist, t)
                return (t, depth, active) + cor

            if bf16:
                err = _BF16_ERR * amax * scale

                def fine_step(t, depth, active, cor):
                    d_fast = _fine_sample(
                        tt_ref, pts, active, res, jk, jkw,
                        precision=jax.lax.Precision.DEFAULT,
                    ) * scale
                    cand = jnp.sum(active * jnp.where(
                        d_fast < threshold * t + err, 1.0, 0.0))

                    def verified(t, depth, active, cor):
                        dist = _fine_sample(
                            tt_ref, pts, active, res, jk, jkw) * scale
                        return exact_step(t, depth, active, cor, dist)

                    def fast(t, depth, active, cor):
                        d_lo = d_fast - err  # certified lower bound
                        cor = corridor(d_lo, t, active, cor)
                        return (
                            jnp.where(active > 0.0, t + d_lo, t), depth,
                            active,
                        ) + cor

                    return jax.lax.cond(
                        cand > 0.0, verified, fast, t, depth, active, cor
                    )
            else:

                def fine_step(t, depth, active, cor):
                    dist = _fine_sample(
                        tt_ref, pts, active, res, jk, jkw) * scale
                    return exact_step(t, depth, active, cor, dist)

            def coarse_step(t, depth, active, cor):
                cor = corridor(cd, t, active, cor)
                return (
                    jnp.where(active > 0.0, t + cd, t), depth, active
                ) + cor

            t, depth, active, *cor = jax.lax.cond(
                near > 0.0, fine_step, coarse_step, t, depth, active, cor
            )
            active = active * jnp.where(t < t_max, 1.0, 0.0)
            return (t, depth, active, step + 1) + tuple(cor)

        zeros = jnp.zeros_like(t0)
        cor0 = (zeros, t0, jnp.full_like(t0, 1e9), zeros, zeros)
        t, depth, _, _, v_prev, t_prev, min_dip, v0, have = jax.lax.while_loop(
            cond, body, (t0, zeros, active0, 0) + cor0
        )
        t_ref, v0_ref, mindip_ref, vlast_ref, tlast_ref = aux_refs
        t_ref[0] = t
        v0_ref[0] = jnp.where(have > 0.0, v0, 0.0)
        mindip_ref[0] = jnp.where(have > 0.0, min_dip, 0.0)
        vlast_ref[0] = jnp.where(have > 0.0, v_prev, 0.0)
        tlast_ref[0] = t_prev
        depth_ref[0] = depth
        return
    if relaxation <= 1.0 and culling and not bf16:
        # v2 culling march (the default): one fine/coarse decision per while
        # iteration, then _UNROLL fine sub-steps with only vector-predicated
        # updates in between.  Measured on v5e, the while-loop machinery
        # (condition reduce, branch selection, pipeline sync) costs ~6-9 us
        # per iteration — MORE than the windowed sample matmul itself (fp32
        # HIGHEST vs 1-pass bf16 matmuls time identically at this size), so
        # amortizing the scalar syncs across several dependent sub-steps is
        # the main lever.  Sub-steps reuse the iteration's table window with
        # a per-ray in-window predicate; rays that drift out of the window
        # simply stall until the next iteration re-centers it (they stay
        # active, so the window always re-covers them — no livelock).
        #
        # ``adaptive``: per-ray auto-over-relaxation (Balint & Valasek 2018
        # style) rides the sub-steps as pure vector ops.  Each ray oversteps
        # by omega * dist; when the unbounding-sphere chain breaks
        # (stepped > d_prev + dist, so the segment is no longer certified
        # surface-free) the ray reverts to its last certified position and
        # omega resets to 1, otherwise omega grows toward _OMEGA_MAX.  This
        # attacks the dominant graze-band cost: grazing rays see a nearly
        # constant field along the ray, so the overlap certificate holds up
        # to omega ~ 2 and their step count halves, while head-on rays
        # (field slope ~ -1) revert once and settle at omega ~ 1.  Hit
        # decisions only ever fire on certified (non-reverted) samples, so
        # no surface the plain march would hit is skipped; hit positions
        # shift within the same stepping-noise class as culling.
        # NOTE (measured dead end, v5e): collapsing the per-iteration scalar
        # reductions (cond sum, near sum, jlo, jhi) into ONE packed (Q, 4)
        # max-reduce with a carried alive scalar + decide-at-body-end was
        # ~1.5 ms SLOWER per 640x480 render — the lane-concat relayout of
        # four lane-0 operands costs more than the merged reduces save.
        if _ALIVE_CARRY:
            # scalar-only while cond: the active-count reduce runs at the
            # END of the body (where its reduce->scalar latency can overlap
            # the epilogue) and rides the carry; cond reads the scalar
            def cond(carry):
                return jnp.logical_and(
                    carry[-1] > 0.0, carry[3] < max_steps
                )
        else:
            def cond(carry):
                _, _, active, step = carry[:4]
                return jnp.logical_and(
                    jnp.sum(active) > 0.0, step < max_steps
                )

        k_iota = jax.lax.broadcasted_iota(
            jnp.int32, (dirs_o.shape[0], res), 1
        )
        # f32 lane fields for the tent-form lerp builds (march samples are
        # OBB-certified in-volume, so the no-extrapolation tent is safe —
        # see _lerp_pair_tent).  Converted once outside the while loop;
        # k_iota_f doubles as the x lane field for the xx tents.
        k_iota_f = k_iota.astype(jnp.float32)
        jkw_f = jkw.astype(jnp.float32)
        if _ZWIN:
            # loop-invariant lane fields for the (Q, WJ*WZ) yz-window rows;
            # the z factor is built at full row width with a modular lane
            # field (a narrow (Q, WZ) build + pltpu.repeat from a 16-lane
            # array lowers pathologically: +15 ms/render, measured)
            jzw, kzw = _zwin_lane_fields(dirs_o.shape[0])
            jzw_f = jzw.astype(jnp.float32)
            kzw_f = kzw.astype(jnp.float32)
        if _MXRED:
            # loop-invariant fields for the matmul-formulated window
            # reduces: a (Q, 2*res) combined lane iota (y cells in lanes
            # [0, res), z cells offset by res in [res, 2*res)), a (1, Q)
            # ones row for the MXU column-sum, and a (1, 2*res) lane iota
            # for the single-vreg min/max extraction
            l2r = jax.lax.broadcasted_iota(
                jnp.int32, (dirs_o.shape[0], 2 * res), 1
            )
            ones_row = jnp.ones((1, dirs_o.shape[0]), jnp.float32)
            lane_r = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * res), 1)
            lane_mod = jnp.where(lane_r < res, lane_r, lane_r - res)

        def decide(t, active):
            """Branch-select + window scalars from the current ray state.

            Returns ``(sel, j0, k0, cd)``.  In stale mode (``_STALE``) this
            runs mid-iteration — after the first sub-step — so the
            reduce->scalar latency of its reductions overlaps the remaining
            sub-steps' vector work instead of stalling the next dispatch;
            the decision is then up to ``_UNROLL - 1`` sub-steps positionally
            stale, which is safe: both branch kinds are safe for any ray
            state (bound steps cannot skip surface; fine samples are exact
            and out-of-window rays stall via the valid predicate).
            """
            p = (origin_o + t * dirs_o) * inv_scale
            cdd, _ = _coarse_lookup(ttc_ref, p, NC, need_max=False)
            cdd = cdd * scale
            # 1e-5 floor prevents zero-progress bound steps near t ~ 0
            near = jnp.sum(
                active * jnp.where(cdd < threshold * t + 1e-5, 1.0, 0.0)
            )
            act = active > 0.0
            byi = _base_frac(p[:, 1:2], res)[0].astype(jnp.int32)
            if _NOFALLBACK and _ZWIN:
                # stall-only windows: anchor y at the lowest active cell,
                # then anchor z at the lowest z-cell among rays INSIDE the
                # y-window — that ray is inside both windows, so at least
                # one ray samples every iteration (no livelock; two
                # independent anchors could have disjoint windows).  Skips
                # the jhi/khi validity reduces entirely.
                jlo = jnp.min(jnp.where(act, byi, res))
                j0 = jnp.minimum(jlo, res - WJ)
                bzi0 = _base_frac(p[:, 2:3], res)[0].astype(jnp.int32)
                iny = jnp.logical_and(act, byi - j0 <= WJ - 2)
                klo = jnp.min(jnp.where(iny, bzi0, res))
                k0 = jnp.minimum((klo // _ZSHIFT) * _ZSHIFT, res - WZ)
                sel = jnp.where(near > 0.0, 1, 0)
                return sel, j0, k0, cdd
            if _MXRED and _ZWIN:
                # matmul-formulated window bounds: the four (Q, 1) column
                # min/max reduces are layout-hostile (a (Q, 1) f32 column
                # is Q/8 nearly-empty vregs), so instead build ONE (Q,
                # 2*res) active-cell presence field (y cells in lanes
                # [0, res), z cells offset by res), column-sum it with a
                # single (1, Q) @ (Q, 2*res) MXU pass, and extract all
                # four bounds with single-vreg LANE reduces of the (1,
                # 2*res) presence row.  Unlike the measured packed-reduce
                # dead end, nothing is lane-concatenated: the field is
                # built from (Q, 1) broadcasts against a hoisted iota.
                bzi0 = _base_frac(p[:, 2:3], res)[0].astype(jnp.int32)
                cells = jnp.where(l2r < res, byi, bzi0 + res)
                pres = jnp.where(
                    jnp.logical_and(l2r == cells, active > 0.0), 1.0, 0.0
                )
                prow = jnp.dot(ones_row, pres,
                               preferred_element_type=jnp.float32,
                               precision=_MM_PRECISION)  # (1, 2*res)
                occ = prow > 0.0
                occ_y = jnp.logical_and(occ, lane_r < res)
                occ_z = jnp.logical_and(occ, lane_r >= res)
                jlo = jnp.min(jnp.where(occ_y, lane_mod, res))
                jhi = jnp.max(jnp.where(occ_y, lane_mod, -1))
                klo = jnp.min(jnp.where(occ_z, lane_mod, res))
                khi = jnp.max(jnp.where(occ_z, lane_mod, -1))
                win_ok = jnp.logical_and(jhi - jlo <= WJ - 2, jhi >= 0)
                j0 = jnp.clip((jlo + jhi - WJ + 2) // 2, 0, res - WJ)
                kc = jnp.clip((klo + khi - WZ + 2) // 2, 0, res - WZ)
                k0 = (kc // _ZSHIFT) * _ZSHIFT
                kz_ok = jnp.logical_and(khi - k0 <= WZ - 2, khi >= 0)
                yz_ok = jnp.logical_and(win_ok, kz_ok)
                sel = jnp.where(
                    near > 0.0,
                    jnp.where(yz_ok, 1, jnp.where(win_ok, 2, 3)),
                    0,
                )
                return sel, j0, k0, cdd
            j0, win_ok = _window_bounds(byi, act, res)
            if _ZWIN:
                bzi0 = _base_frac(p[:, 2:3], res)[0].astype(jnp.int32)
                k0, kz_ok = _zwindow_bounds(bzi0, act, res)
                yz_ok = jnp.logical_and(win_ok, kz_ok)
                sel = jnp.where(
                    near > 0.0,
                    jnp.where(yz_ok, 1, jnp.where(win_ok, 2, 3)),
                    0,
                )
            else:
                k0 = jnp.int32(0)
                sel = jnp.where(near > 0.0, jnp.where(win_ok, 1, 2), 0)
            return sel, j0, k0, cdd

        def body(carry):
            if _STALE:
                (t, depth, active, step, stepped, d_prev, omega,
                 sel, j0, k0) = carry[:10]
                cd = None  # the coarse branch recomputes its bound fresh
            elif _DECIDE_EVERY > 1:
                # carried-decision mode: decide runs only every Nth
                # iteration; in between, the carried (sel, j0, k0) route
                # the switch.  Staleness is safe for the same reason as
                # _STALE (any branch is safe for any ray state; stale
                # windows only stall rays via the valid predicates), and
                # unlike _STALE the decide block stays at the body top —
                # no duplication into the switch branches, so no spill.
                # The coarse branch recomputes its bound fresh (a stale
                # bound is not safe to step by).
                (t, depth, active, step, stepped, d_prev, omega,
                 sel, j0, k0) = carry[:10]
                cd = None
                sel, j0, k0 = jax.lax.cond(
                    step % _DECIDE_EVERY == 0,
                    lambda: decide(t, active)[:3],
                    lambda: (sel, j0, k0),
                )
            else:
                t, depth, active, step, stepped, d_prev, omega = carry[:7]
                sel, j0, k0, cd = decide(t, active)

            def substeps(t, depth, active, stepped, d_prev, omega, sample):
                dec = ()
                for i in range(_UNROLL):
                    p = (origin_o + t * dirs_o) * inv_scale
                    if _STALE and i == min(1, _UNROLL - 1):
                        dec = decide(t, active)[:3]
                    dist, valid = sample(p)
                    upd = active * valid
                    if adaptive:
                        # uncertified overstep: spheres don't overlap
                        revert = (
                            upd
                            * jnp.where(stepped > d_prev + dist, 1.0, 0.0)
                            * jnp.where(stepped > 0.0, 1.0, 0.0)
                        )
                        ok = upd * (1.0 - revert)
                        hit = ok * jnp.where(dist < threshold * t, 1.0, 0.0)
                        depth = jnp.where(hit > 0.0, -t * dz, depth)
                        active = active * (1.0 - hit)
                        move = active * valid
                        adv = move * (1.0 - revert)
                        step_len = omega * dist
                        t = jnp.where(
                            revert > 0.0, t - stepped + d_prev,
                            jnp.where(adv > 0.0, t + step_len, t),
                        )
                        stepped = jnp.where(
                            revert > 0.0, 0.0,
                            jnp.where(adv > 0.0, step_len, stepped),
                        )
                        d_prev = jnp.where(adv > 0.0, dist, d_prev)
                        omega = jnp.where(
                            revert > 0.0, 1.0,
                            jnp.where(
                                adv > 0.0,
                                jnp.minimum(omega + _OMEGA_GROW, _OMEGA_MAX),
                                omega,
                            ),
                        )
                    else:
                        hit = upd * jnp.where(dist < threshold * t, 1.0, 0.0)
                        depth = jnp.where(hit > 0.0, -t * dz, depth)
                        active = active * (1.0 - hit)
                        t = jnp.where(active * valid > 0.0, t + dist, t)
                    # per-sub-step deactivation: a ray past t_max must not
                    # sample (extrapolated values could false-hit)
                    active = active * jnp.where(t < t_max, 1.0, 0.0)
                return (t, depth, active, stepped, d_prev, omega) + dec

            def coarse_branch(t, depth, active, stepped, d_prev, omega):
                # bound steps are always safe (cd lower-bounds the field),
                # so extra sub-steps amortize the iteration overhead the
                # same way fine sub-steps do; a ray whose new bound dips
                # below the termination band stalls for the next
                # iteration's fine/coarse decision (no hits ever happen
                # here, so no t_max re-check is needed).  A bound step is a
                # certified plain step, so it restarts the overstep chain.
                # Bound REFRESHES use the mid-level table when enabled
                # (finer cells -> longer certified steps in the near
                # field); the decide's lookup stays at NC (see NCM note).
                mid_ref, mid_nc = (
                    (ttm_ref, NCM) if _MIDLEVEL else (ttc_ref, NC)
                )
                if _STALE or _DECIDE_EVERY > 1:
                    # the carried decision chose this branch; the bound
                    # itself must be fresh (a stale bound is not safe to
                    # step by after the rays have moved)
                    p = (origin_o + t * dirs_o) * inv_scale
                    cd0, _ = _coarse_lookup(mid_ref, p, mid_nc,
                                            need_max=False)
                    cd0 = cd0 * scale
                else:
                    cd0 = cd
                moved = active > 0.0
                t = jnp.where(moved, t + cd0, t)
                dec = decide(t, active)[:3] if _STALE else ()
                for _ in range(_UNROLL_COARSE - 1):
                    p = (origin_o + t * dirs_o) * inv_scale
                    cd2, _ = _coarse_lookup(mid_ref, p, mid_nc,
                                            need_max=False)
                    cd2 = cd2 * scale
                    far = jnp.where(cd2 >= threshold * t + 1e-5, 1.0, 0.0)
                    t = jnp.where(active * far > 0.0, t + cd2, t)
                if adaptive:
                    stepped = jnp.where(moved, 0.0, stepped)
                return (t, depth, active, stepped, d_prev, omega) + dec

            def fine_win_branch(t, depth, active, stepped, d_prev, omega):
                tw = tt_ref[pl.ds(j0 * res, WJ * res), :]

                def sample(p):
                    (bx, by, bz), (fx, fy, fz) = _bases_fracs(p, res)
                    rel = by.astype(jnp.int32) - j0
                    valid = jnp.where(
                        jnp.logical_and(rel >= 0, rel <= WJ - 2), 1.0, 0.0
                    )
                    xx = _lerp_pair_tent(bx + fx, k_iota_f)
                    v64 = _lerp_pair_tent(bz + fz, k_iota_f)
                    u = _lerp_pair_tent(
                        by + fy - j0.astype(jnp.float32), jkw_f
                    )
                    a = u * pltpu.repeat(v64, WJ, axis=1)
                    m = jnp.dot(a, tw, preferred_element_type=jnp.float32,
                                precision=_MM_PRECISION)
                    return (
                        jnp.sum(m * xx, axis=1, keepdims=True) * scale,
                        valid,
                    )

                return substeps(t, depth, active, stepped, d_prev, omega,
                                sample)

            def fine_yz_branch(t, depth, active, stepped, d_prev, omega):
                # two-axis window: one contiguous WJ*WZ-row slice of the
                # shifted-variant table = the (y, z) sub-box
                # [j0, j0+WJ) x [k0, k0+WZ); 4x narrower row build and 4x
                # shallower matmul than the y-window tier
                row0 = (k0 // _ZSHIFT) * (res * WZ) + j0 * WZ
                tw = ttz_ref[pl.ds(row0, WJ * WZ), :]

                def sample(p):
                    (bx, by, bz), (fx, fy, fz) = _bases_fracs(p, res)
                    rj = by.astype(jnp.int32) - j0
                    rk = bz.astype(jnp.int32) - k0
                    valid = jnp.where(
                        jnp.logical_and(rj >= 0, rj <= WJ - 2), 1.0, 0.0
                    ) * jnp.where(
                        jnp.logical_and(rk >= 0, rk <= WZ - 2), 1.0, 0.0
                    )
                    xx = _lerp_pair_tent(bx + fx, k_iota_f)
                    u = _lerp_pair_tent(
                        by + fy - j0.astype(jnp.float32), jzw_f
                    )
                    vz = _lerp_pair_tent(
                        bz + fz - k0.astype(jnp.float32), kzw_f
                    )
                    a = u * vz
                    m = jnp.dot(a, tw, preferred_element_type=jnp.float32,
                                precision=_MM_PRECISION)
                    return (
                        jnp.sum(m * xx, axis=1, keepdims=True) * scale,
                        valid,
                    )

                return substeps(t, depth, active, stepped, d_prev, omega,
                                sample)

            def fine_full_branch(t, depth, active, stepped, d_prev, omega):
                # full-coverage fine step as res/WJ static quarter-window
                # matmuls accumulated sequentially: bitwise the same sums
                # as one (Q, res^2) row (each row block contributes its own
                # one-hot weights), but peak scoped-VMEM scratch is one
                # (Q, WJ*res) quarter (1 MiB) instead of 4 MiB — the
                # monolithic row overflowed the 16 MiB budget once the
                # zwin table shipped.  Reuses the jkw lane field per
                # quarter (rel is shifted by the quarter anchor).
                def sample(p):
                    (bx, by, bz), (fx, fy, fz) = _bases_fracs(p, res)
                    yq = by + fy
                    xx = _lerp_pair_tent(bx + fx, k_iota_f)
                    v64 = _lerp_pair_tent(bz + fz, k_iota_f)
                    rv = pltpu.repeat(v64, WJ, axis=1)
                    m = jnp.zeros((by.shape[0], res), jnp.float32)
                    for h in range(res // WJ):
                        u = _lerp_pair_tent(yq - float(h * WJ), jkw_f)
                        m = m + jnp.dot(
                            u * rv, tt_ref[pl.ds(h * WJ * res, WJ * res), :],
                            preferred_element_type=jnp.float32,
                            precision=_MM_PRECISION,
                        )
                    return (
                        jnp.sum(m * xx, axis=1, keepdims=True) * scale,
                        1.0,
                    )

                return substeps(t, depth, active, stepped, d_prev, omega,
                                sample)

            if _NOFALLBACK and _ZWIN:
                branches = [coarse_branch, fine_yz_branch]
            elif _ZWIN:
                branches = [coarse_branch, fine_yz_branch, fine_win_branch,
                            fine_full_branch]
            else:
                branches = [coarse_branch, fine_win_branch, fine_full_branch]
            out = jax.lax.switch(
                sel, branches,
                t, depth, active, stepped, d_prev, omega,
            )
            t, depth, active, stepped, d_prev, omega = out[:6]
            active = active * jnp.where(t < t_max, 1.0, 0.0)
            tail = (sel, j0, k0) if _DECIDE_EVERY > 1 else tuple(out[6:])
            if _ALIVE_CARRY:
                tail = tail + (jnp.sum(active),)
            return (t, depth, active, step + 1, stepped, d_prev,
                    omega) + tail

        if _PREBOUND:
            # hoisted coarse burst: rays enter at the OBB shell, so most
            # tiles spend their first 1-2 while iterations on bound steps
            # — taking those steps HERE (trace-time unrolled, no decide /
            # switch / cond machinery) removes whole loop iterations.
            # Far-guarded bound steps never skip a surface; near rays
            # simply stall until the loop's first fine iteration.
            for _ in range(_PREBOUND):
                pp = (origin_o + t0 * dirs_o) * inv_scale
                cdp, _ = _coarse_lookup(ttc_ref, pp, NC, need_max=False)
                cdp = cdp * scale
                farp = jnp.where(cdp >= threshold * t0 + 1e-5, 1.0, 0.0)
                t0 = jnp.where(active0 * farp > 0.0, t0 + cdp, t0)
            active0 = active0 * jnp.where(t0 < t_max, 1.0, 0.0)
        zeros = jnp.zeros_like(t0)
        carry0 = (t0, zeros, active0, 0, zeros, zeros,
                  jnp.full_like(t0, _OMEGA_INIT if adaptive else 1.0))
        if _STALE or _DECIDE_EVERY > 1:
            sel0, j00, k00, _ = decide(t0, active0)
            carry0 = carry0 + (sel0, j00, k00)
        if _ALIVE_CARRY:
            carry0 = carry0 + (jnp.sum(active0),)
        out = jax.lax.while_loop(cond, body, carry0)
        depth_ref[0] = out[1]
        return
    if relaxation <= 1.0 and culling:
        # hierarchical empty-space culling: every step first does a cheap
        # piecewise-constant lookup of the coarse min-pool lower bound.  If
        # EVERY active ray in the tile has bound >= threshold*t, no hit is
        # possible at this sample (fine value >= bound), so the tile steps
        # by the bound without touching the big fine matmul.  Otherwise one
        # plain fine step runs for the whole tile.  Bound steps are strictly
        # smaller than the fine step the plain march would take, so no
        # surface the plain march would hit is skipped (hit positions can
        # shift by stepping noise, same class as relaxed tracing).
        def cond(carry):
            _, _, active, step = carry
            return jnp.logical_and(jnp.sum(active) > 0.0, step < max_steps)

        def body(carry):
            t, depth, active, step = carry
            pts = (origin_o + t * dirs_o) * inv_scale
            cd, amax = _coarse_lookup(ttc_ref, pts, NC, need_max=bf16)
            cd = cd * scale
            # 1e-5 floor prevents zero-progress bound steps near t ~ 0
            near = jnp.sum(
                active * jnp.where(cd < threshold * t + 1e-5, 1.0, 0.0)
            )

            def exact_step(t, depth, active, dist):
                hit = jnp.where(dist < threshold * t, 1.0, 0.0)
                depth = jnp.where(active * hit > 0.0, -t * dz, depth)
                active = active * (1.0 - hit)
                t = jnp.where(active > 0.0, t + dist, t)
                return t, depth, active

            if bf16:
                # mixed-precision fine step: sample with the 1-pass bf16
                # matmul (~6x cheaper); the certified error bound err =
                # _BF16_ERR * max|corner values| gates an exact fp32
                # verification pass — only when some ray's bf16 value is
                # within err of its termination band can a hit decision
                # depend on the precision, so hit tests and hit depths stay
                # exactly fp32 while far steps use the cheap pass (stepping
                # by d_fast - err <= d_exact: conservative, never skips)
                err = _BF16_ERR * amax * scale

                def fine_step(t, depth, active):
                    d_fast = _fine_sample(
                        tt_ref, pts, active, res, jk, jkw,
                        precision=jax.lax.Precision.DEFAULT,
                    ) * scale
                    cand = jnp.sum(active * jnp.where(
                        d_fast < threshold * t + err, 1.0, 0.0))

                    def verified(t, depth, active):
                        dist = _fine_sample(
                            tt_ref, pts, active, res, jk, jkw) * scale
                        return exact_step(t, depth, active, dist)

                    def fast(t, depth, active):
                        t = jnp.where(active > 0.0, t + d_fast - err, t)
                        return t, depth, active

                    return jax.lax.cond(
                        cand > 0.0, verified, fast, t, depth, active
                    )
            else:

                def fine_step(t, depth, active):
                    dist = _fine_sample(
                        tt_ref, pts, active, res, jk, jkw) * scale
                    return exact_step(t, depth, active, dist)

            def coarse_step(t, depth, active):
                return jnp.where(active > 0.0, t + cd, t), depth, active

            t, depth, active = jax.lax.cond(
                near > 0.0, fine_step, coarse_step, t, depth, active
            )
            active = active * jnp.where(t < t_max, 1.0, 0.0)
            return t, depth, active, step + 1

        _, depth, _, _ = jax.lax.while_loop(
            cond, body, (t0, jnp.zeros_like(t0), active0, 0)
        )
    elif relaxation <= 1.0:
        # plain sphere tracing (exact reference semantics)
        def cond(carry):
            _, _, active, step = carry
            return jnp.logical_and(jnp.sum(active) > 0.0, step < max_steps)

        def body(carry):
            t, depth, active, step = carry
            pts = (origin_o + t * dirs_o) * inv_scale
            dist = _sample_tile(tt_ref, pts, res, jk) * scale
            hit = jnp.where(dist < threshold * t, 1.0, 0.0)
            terminated = active * hit
            depth = jnp.where(terminated > 0.0, -t * dz, depth)
            active = active * (1.0 - hit)
            t = jnp.where(active > 0.0, t + dist, t)
            active = active * jnp.where(t < t_max, 1.0, 0.0)
            return t, depth, active, step + 1

        _, depth, _, _ = jax.lax.while_loop(
            cond, body, (t0, jnp.zeros_like(t0), active0, 0)
        )
    elif culling:
        # relaxed sphere tracing composed with empty-space culling: tiles
        # whose active rays all have coarse bound >= threshold*t AND whose
        # pending overshoots are validated by the bound (stepped <= d_prev +
        # cd implies the unbounding spheres overlap, since cd lower-bounds
        # the field at the current point) step by the bound; otherwise a
        # fine relaxed step runs with the usual revert fallback
        def cond(carry):
            _, _, active, _, _, step = carry
            return jnp.logical_and(jnp.sum(active) > 0.0, step < max_steps)

        def body(carry):
            t, depth, active, stepped, d_prev, step = carry
            pts = (origin_o + t * dirs_o) * inv_scale
            cd, amax = _coarse_lookup(ttc_ref, pts, NC, need_max=bf16)
            cd = cd * scale
            near = jnp.sum(active * (
                jnp.where(cd < threshold * t + 1e-5, 1.0, 0.0)
                + jnp.where(stepped > d_prev + cd, 1.0, 0.0)
            ))

            def relaxed_update(t, depth, active, stepped, d_prev,
                               d_cert, d_step, allow_hit):
                # d_cert: certified lower bound of the field at t (sphere
                # radius for the overlap test / safe fallback position);
                # d_step: value used for the overstep length
                revert = (
                    active
                    * jnp.where(stepped > d_prev + d_cert, 1.0, 0.0)
                    * jnp.where(stepped > 0.0, 1.0, 0.0)
                )
                advance = active * (1.0 - revert)
                if allow_hit:
                    hit = advance * jnp.where(
                        d_cert < threshold * t, 1.0, 0.0
                    )
                    depth = jnp.where(hit > 0.0, -t * dz, depth)
                    active = active * (1.0 - hit)
                t_safe = t - stepped + d_prev
                new_t = jnp.where(
                    revert > 0.0, t_safe, t + relaxation * d_step
                )
                t = jnp.where(active > 0.0, new_t, t)
                stepped = jnp.where(revert > 0.0, 0.0, relaxation * d_step)
                d_prev = jnp.where(revert > 0.0, d_prev, d_cert)
                return t, depth, active, stepped, d_prev

            if bf16:
                err = _BF16_ERR * amax * scale

                def fine_step(t, depth, active, stepped, d_prev):
                    d_fast = _sample_tile(
                        tt_ref, pts, res, jk,
                        precision=jax.lax.Precision.DEFAULT,
                    ) * scale
                    cand = jnp.sum(active * jnp.where(
                        d_fast < threshold * t + err, 1.0, 0.0))

                    def verified(t, depth, active, stepped, d_prev):
                        d = _sample_tile(tt_ref, pts, res, jk) * scale
                        return relaxed_update(
                            t, depth, active, stepped, d_prev, d, d, True
                        )

                    def fast(t, depth, active, stepped, d_prev):
                        # no hit possible (d >= d_fast - err >= threshold*t)
                        return relaxed_update(
                            t, depth, active, stepped, d_prev,
                            d_fast - err, d_fast, False,
                        )

                    return jax.lax.cond(
                        cand > 0.0, verified, fast,
                        t, depth, active, stepped, d_prev,
                    )
            else:

                def fine_step(t, depth, active, stepped, d_prev):
                    d = _sample_tile(tt_ref, pts, res, jk) * scale
                    return relaxed_update(
                        t, depth, active, stepped, d_prev, d, d, True
                    )

            def coarse_step(t, depth, active, stepped, d_prev):
                # bound-validated: any pending overshoot's spheres overlap,
                # so the position is safe; take a plain bound step
                t = jnp.where(active > 0.0, t + cd, t)
                stepped = jnp.where(active > 0.0, 0.0, stepped)
                d_prev = jnp.where(active > 0.0, 0.0, d_prev)
                return t, depth, active, stepped, d_prev

            t, depth, active, stepped, d_prev = jax.lax.cond(
                near > 0.0, fine_step, coarse_step,
                t, depth, active, stepped, d_prev,
            )
            active = active * jnp.where(t < t_max, 1.0, 0.0)
            return t, depth, active, stepped, d_prev, step + 1

        _, depth, _, _, _, _ = jax.lax.while_loop(
            cond,
            body,
            (t0, jnp.zeros_like(t0), active0, jnp.zeros_like(t0),
             jnp.zeros_like(t0), 0),
        )
    else:
        # relaxed sphere tracing (Keinert et al. 2014): over-step by the
        # relaxation factor; when consecutive unbounding spheres do not
        # overlap (stepped > d_prev + d) the overshoot is reverted to the
        # last safe position and that ray falls back to a plain step, so no
        # surface the plain march would hit is skipped
        def cond(carry):
            _, _, active, _, _, step = carry
            return jnp.logical_and(jnp.sum(active) > 0.0, step < max_steps)

        def body(carry):
            t, depth, active, stepped, d_prev, step = carry
            pts = (origin_o + t * dirs_o) * inv_scale
            d = _sample_tile(tt_ref, pts, res, jk) * scale
            # only a previously over-stepped ray can revert (stepped > 0);
            # rays starting inside the surface must hit, not loop
            revert = (
                active
                * jnp.where(stepped > d_prev + d, 1.0, 0.0)
                * jnp.where(stepped > 0.0, 1.0, 0.0)
            )
            advance = active * (1.0 - revert)
            hit = advance * jnp.where(d < threshold * t, 1.0, 0.0)
            depth = jnp.where(hit > 0.0, -t * dz, depth)
            advance = advance * (1.0 - hit)
            active = active * (1.0 - hit)
            # reverted rays go back to the safe position and re-march plainly
            t_safe = t - stepped + d_prev
            new_t = jnp.where(revert > 0.0, t_safe, t + relaxation * d)
            t = jnp.where(active > 0.0, new_t, t)
            stepped = jnp.where(revert > 0.0, 0.0, relaxation * d)
            d_prev = jnp.where(revert > 0.0, d_prev, d)
            active = active * jnp.where(t < t_max, 1.0, 0.0)
            return t, depth, active, stepped, d_prev, step + 1

        _, depth, _, _, _, _ = jax.lax.while_loop(
            cond,
            body,
            (
                t0,
                jnp.zeros_like(t0),
                active0,
                jnp.zeros_like(t0),
                jnp.zeros_like(t0),
                0,
            ),
        )
    depth_ref[0] = depth


@functools.lru_cache(maxsize=8)
def _camera_ray_planes(camera: Camera):
    """Trace-time numpy constants: (H, W, 3) ray dirs + tiled x/y/z planes.

    These depend only on the (static) camera, but when computed with jnp
    inside the traced function XLA re-executed the three tile-transpose
    copies EVERY pose (~0.7 ms/render at 640x480, measured in a profiler
    trace).  Computing them host-side at trace time turns them into
    executable constants with zero runtime cost.  float64 intermediate
    matches jnp's f32 math to 1 ulp.
    """
    import numpy as np

    fx, fy, cx, cy, _ = camera.get_pinhole_camera_parameters(0.5)
    h, w = camera.height, camera.width
    rows, cols = np.mgrid[0:h, 0:w].astype(np.float64)
    dx = (cols + 0.5 - cx) / fx
    dy = -(rows + 0.5 - cy) / fy
    inv = 1.0 / np.sqrt(dx * dx + dy * dy + 1.0)
    d = np.stack([dx * inv, dy * inv, -inv], axis=-1).astype(np.float32)
    if h % TILE or w % TILE:
        # unaligned raster (legal for ROI renders, which tile a slice of
        # ``d`` at runtime instead): no full-frame tiled planes exist
        return d, None, None, None
    n_tiles = (h // TILE) * (w // TILE)

    def tile(plane):
        t = plane.reshape(h // TILE, TILE, w // TILE, TILE)
        t = np.moveaxis(t, 2, 1)
        return np.ascontiguousarray(t.reshape(n_tiles, TILE * TILE, 1))

    return d, tile(d[..., 0]), tile(d[..., 1]), tile(d[..., 2])


def _tile_image(x: jax.Array, h: int, w: int) -> jax.Array:
    """(H, W, ...) -> (T*Q, ...) in 16x16 tile-major order."""
    trailing = x.shape[2:]
    x = x.reshape(h // TILE, TILE, w // TILE, TILE, *trailing)
    x = jnp.moveaxis(x, 2, 1)
    return x.reshape(-1, *trailing)


def _untile_image(x: jax.Array, h: int, w: int) -> jax.Array:
    """Inverse of :func:`_tile_image` for flat (T*Q,) arrays."""
    x = x.reshape(h // TILE, w // TILE, TILE, TILE)
    x = jnp.moveaxis(x, 1, 2)
    return x.reshape(h, w)


@functools.partial(
    jax.jit,
    static_argnames=("camera", "threshold", "max_steps", "relaxation",
                     "culling", "bf16", "aux", "adaptive", "interpret",
                     "roi"),
)
def render_depth_pallas_fwd(
    sdf: jax.Array,
    position: jax.Array,
    orientation: jax.Array,
    inv_scale: jax.Array,
    camera: Camera,
    threshold: float = 0.0,
    max_steps: int = 200,
    relaxation: float = 1.0,
    culling: bool = True,
    bf16: bool = False,
    t_init=None,
    skip=None,
    aux: bool = False,
    adaptive: bool = True,
    interpret=None,
    roi=None,
    roi_offset=None,
):
    """Forward sphere-trace via the Pallas tile kernel; returns (H, W) depth.

    Numerics match :func:`sdfest_tpu.render.xla._render_forward` (same OBB
    test, termination rule and conventions); only the execution strategy
    differs.  Under ``jax.vmap`` batch elements run sequentially (see
    :func:`_sequential_vmap`).

    Temporal-coherence hooks (culling variant only):

    - ``t_init`` (H, W): per-ray warm-start distance; rays with ``t_init >=
      0`` start marching at ``max(t_min, t_init)`` instead of the OBB entry.
    - ``skip`` (H, W): rays with ``skip > 0`` are not marched (depth 0).
    - ``aux=True``: additionally return a dict with per-ray corridor data
      (``t`` terminal distance, ``v0``/``min_dip``/``v_last``/``t_last``
      clearance bounds — see :func:`_march_kernel`) plus the ray setup
      (``t0`` actual start, ``t_min``/``t_max`` OBB interval) for warm-start
      bookkeeping across refinement iterations.

    ROI rendering: with ``roi=(Hr, Wr)`` (static) and ``roi_offset``
    ((2,) int array, top-left row/col — may be traced), only that crop of
    the image is rendered: the per-pixel ray directions are dynamic slices
    of the full camera's direction planes, so the result equals the same
    crop of a full-frame render exactly (rays are pixel-independent).
    This is the production refinement fast path — the object typically
    covers a fraction of the frame, and active tiles scale with ROI area.
    Not supported together with the warm-start inputs.
    """
    if roi is not None and (t_init is not None or skip is not None):
        raise ValueError("roi rendering does not support warm-start inputs")
    impl = functools.partial(
        _render_fwd_impl, camera=camera, threshold=threshold,
        max_steps=max_steps, relaxation=relaxation, culling=culling,
        bf16=bf16, aux=aux, adaptive=adaptive,
        interpret=_resolve_interpret(interpret), roi=roi)
    if roi is not None:
        roi_offset = jnp.zeros((2,), jnp.int32) if roi_offset is None else (
            jnp.asarray(roi_offset, jnp.int32)
        )
        return _sequential_vmap(
            lambda s, p, q, i, off: impl(s, p, q, i, None, None,
                                         roi_offset=off),
            sdf, position, orientation, inv_scale, roi_offset)
    if t_init is None and skip is None:
        return _sequential_vmap(
            lambda s, p, q, i: impl(s, p, q, i, None, None),
            sdf, position, orientation, inv_scale)
    h, w = camera.height, camera.width
    if t_init is None:
        t_init = jnp.full((h, w), -1.0, jnp.float32)
    if skip is None:
        skip = jnp.zeros((h, w), jnp.float32)
    return _sequential_vmap(
        lambda s, p, q, i, ti, sk: impl(s, p, q, i, ti, sk),
        sdf, position, orientation, inv_scale,
        t_init.astype(jnp.float32), skip.astype(jnp.float32))


def _render_fwd_impl(
    sdf: jax.Array,
    position: jax.Array,
    orientation: jax.Array,
    inv_scale: jax.Array,
    t_init,
    skip,
    *,
    camera: Camera,
    threshold: float,
    max_steps: int,
    relaxation: float,
    culling: bool,
    bf16: bool,
    aux: bool,
    adaptive: bool,
    interpret: bool,
    roi=None,
    roi_offset=None,
):
    """Unbatched march body behind :func:`render_depth_pallas_fwd`."""
    res = sdf.shape[0]
    if res != RES:
        raise ValueError(f"Pallas renderer requires res={RES}, got {res}")
    h, w = camera.height, camera.width
    if roi is not None:
        h, w = roi
    if h % TILE or w % TILE:
        raise ValueError(f"Image dims must be multiples of {TILE}")

    dtype = jnp.float32
    sdf = sdf.astype(dtype)
    # NOTE: a fully-tiled prologue (tile dirs once, run the OBB math and
    # rotation on flat (HW, 3) arrays) was measured SLOWER (+0.7-1 ms):
    # minor-dim-3 layouts compute at 3/128-lane occupancy; the (H, W)
    # raster layout keeps the OBB math lane-friendly
    dirs_np, dx_np, dy_np, dz_np = _camera_ray_planes(camera)
    dirs = jnp.asarray(dirs_np)
    if roi is not None:
        # ROI crop: the ray directions (and hence everything downstream)
        # are a dynamic slice of the full camera's planes.  The tiled plane
        # operands are rebuilt at runtime from the slice; they are
        # loop-invariant for a fixed offset, so XLA hoists the transposes
        # out of refinement scans.
        oy = roi_offset[0]
        ox = roi_offset[1]
        zero = jnp.zeros((), oy.dtype)
        dirs = jax.lax.dynamic_slice(dirs, (oy, ox, zero), (h, w, 3))
    scale = 1.0 / inv_scale
    hit, t_min, t_max = _obb_intersect(dirs, position, orientation, scale)
    rot = quaternion.to_rotation_matrix(orientation)
    origin_o = (rot.T @ (-position)).reshape(1, 3)

    t0 = t_min
    warm = t_init is not None or skip is not None
    if t_init is None:
        t_init = jnp.full((h, w), -1.0, dtype)
    if skip is None:
        skip = jnp.zeros((h, w), dtype)
    if warm:
        t0 = jnp.where(t_init >= 0.0, jnp.maximum(t_min, t_init.astype(dtype)),
                       t_min)
    active0 = hit & (t0 < t_max) & (skip <= 0.0)

    # camera-constant direction planes, tiled at trace time (executable
    # constants; the kernel rotates them into the object frame).  ROI
    # renders tile the sliced planes at runtime instead (hoisted by XLA
    # when the offset is loop-invariant, e.g. across a refinement scan).
    n_tiles = (h // TILE) * (w // TILE)
    if roi is not None:
        dx_t = _tile_image(dirs[..., 0:1], h, w).reshape(n_tiles, QM, 1)
        dy_t = _tile_image(dirs[..., 1:2], h, w).reshape(n_tiles, QM, 1)
        dz_t = _tile_image(dirs[..., 2:3], h, w).reshape(n_tiles, QM, 1)
    else:
        dx_t = jnp.asarray(dx_np)
        dy_t = jnp.asarray(dy_np)
        dz_t = jnp.asarray(dz_np)

    table = sdf_to_table(sdf)
    if aux and (not culling or relaxation > 1.0):
        raise ValueError(
            "aux corridor outputs require the plain culling variant"
        )
    table_c = (
        coarse_min_table(sdf)
        if culling
        else jnp.zeros((NC * NC, 2 * NC), dtype)
    )
    # mid-level bound table for the coarse branch's refresh steps (only the
    # default v2 culling march consumes it; other variants get the dummy)
    use_mid = (
        _MIDLEVEL and culling and relaxation <= 1.0 and not aux and not bf16
    )
    table_m = (
        coarse_min_table(sdf, NCM)
        if use_mid
        else jnp.zeros((8, 8), dtype)
    )
    # shifted z-band table for the v2 yz-window tier (dummy when unused)
    use_zwin = bool(_ZWIN) and culling and relaxation <= 1.0 and not bf16
    table_z = (
        zwin_table(sdf) if use_zwin else jnp.zeros((8, res), dtype)
    )
    scalars = jnp.stack(
        [inv_scale.astype(dtype), jnp.asarray(threshold, dtype)]
    ).reshape(1, 2)

    # active-tile compaction: grid step t processes the t-th ACTIVE tile
    # (scalar-prefetched index list); steps past the active count re-map to
    # the last active tile so Mosaic elides their block DMAs and the guard
    # in :func:`_march_kernel` makes them ~free.  Inactive tiles' outputs
    # are uninitialized and selected to their defaults below.  The tile
    # activity reduces the raster-layout mask directly (windowed reduce, no
    # materialized tiled copy); the kernel re-derives the per-ray ray
    # intervals itself (:func:`_obb_interval_tile`), so t0/t_max/active
    # never ship as tiled operands.
    act_tile = jnp.any(
        active0.reshape(h // TILE, TILE, w // TILE, TILE), axis=(1, 3)
    ).reshape(n_tiles)
    sprefetch = _compaction_prefetch(act_tile)
    # dynamic grid: exactly count steps run (inactive tiles are never even
    # swept — the former static-grid tail cost ~1.7 us/tile, ~2 ms/render
    # at 640x480).  Safe only because vmap never batches this pallas_call
    # (see _sequential_vmap / _compaction_prefetch).
    count = sprefetch[0]

    remap = lambda t, s: (s[1 + t], 0, 0)
    tile_spec = pl.BlockSpec((1, QM, 1), remap, memory_space=pltpu.VMEM)
    tile_shape = jax.ShapeDtypeStruct((n_tiles, QM, 1), dtype)
    n_out = 6 if aux else 1
    warm_specs = []
    warm_args = []
    if warm:
        tinit_t = _tile_image(t_init.astype(dtype)[..., None], h, w).reshape(
            n_tiles, QM, 1
        )
        skip_t = _tile_image(skip.astype(dtype)[..., None], h, w).reshape(
            n_tiles, QM, 1
        )
        warm_specs = [tile_spec, tile_spec]
        warm_args = [tinit_t, skip_t]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(count,),
        in_specs=[
            pl.BlockSpec((res * res, res), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NC * NC, 2 * NC), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(table_m.shape, lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(table_z.shape, lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec,
            tile_spec,
            tile_spec,
            pl.BlockSpec((3, 3), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + warm_specs,
        out_specs=[tile_spec] * n_out,
    )
    out = pl.pallas_call(
        functools.partial(_march_kernel, res=res, max_steps=max_steps,
                          relaxation=relaxation, culling=culling,
                          bf16=bf16 and culling, aux=aux, warm=warm,
                          adaptive=adaptive),
        grid_spec=grid_spec,
        out_shape=[tile_shape] * n_out,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(
        sprefetch,
        table,
        table_c,
        table_m,
        table_z,
        dx_t,
        dy_t,
        dz_t,
        rot.astype(dtype),
        origin_o.astype(dtype),
        scalars,
        *warm_args,
    )
    # per-ray mask of tiles the kernel actually wrote
    written = _untile_image(
        jnp.broadcast_to(act_tile[:, None], (n_tiles, QM)).reshape(-1), h, w
    )
    untile = lambda x: _untile_image(x.reshape(n_tiles * QM), h, w)
    zeros_if_skipped = lambda x: jnp.where(written, untile(x), 0.0)
    depth = zeros_if_skipped(out[0])
    if not aux:
        return depth
    # skipped tiles get the values an all-inactive marched tile would have
    # produced: t stays at its start, corridor fields zero
    return depth, {
        "t": jnp.where(written, untile(out[1]), t0),
        "v0": zeros_if_skipped(out[2]),
        "min_dip": zeros_if_skipped(out[3]),
        "v_last": zeros_if_skipped(out[4]),
        "t_last": jnp.where(written, untile(out[5]), t0),
        "t0": t0,
        "t_min": t_min,
        "t_max": t_max,
    }


# ---------------------------------------------------------------------------
# standalone sampling kernels (pc loss + surrogate backward)
# ---------------------------------------------------------------------------


def _sample_kernel(s_ref, tt_ref, ttz_ref, pts_ref, mask_ref, out_ref,
                   *, res: int):
    @pl.when(pl.program_id(0) < s_ref[0])
    def _():
        mask = mask_ref[0]
        q = pts_ref[0].shape[0]
        out_ref[0] = _fine_sample(
            tt_ref, pts_ref[0], mask, res, None, _win_iota(q, res),
            ttz_ref=ttz_ref,
        ) * mask


def _window_bounds(byi: jax.Array, act: jax.Array, res: int,
                   center: bool = True):
    """(j0, ok): WJ-cell window start covering the active rows, validity.

    With ``center=True`` (default) the window is CENTERED on the active
    span (rather than anchored at its low edge): rays move during the
    iteration's unrolled sub-steps, and symmetric headroom halves the
    chance of drifting out of the window mid-iteration (an out-of-window
    ray stalls a full iteration).  Coverage: with span <= WJ - 2 the
    centered start satisfies j0 <= jlo and jhi <= j0 + WJ - 2, so ``ok``
    semantics are unchanged.

    ``center=False`` anchors at the lowest active cell.  REQUIRED for
    callers without a full-table fallback (the corridor-tracking aux
    march): when the span exceeds the window, a centered window can cover
    NO active ray (bimodal spans), stalling the whole tile, whereas the
    low anchor guarantees the lowest rays always sample and the window
    walks upward.
    """
    jlo = jnp.min(jnp.where(act, byi, res))
    jhi = jnp.max(jnp.where(act, byi, -1))
    ok = jnp.logical_and(jhi - jlo <= WJ - 2, jhi >= 0)
    if not center:
        return jnp.minimum(jlo, res - WJ), ok
    j0 = jnp.clip((jlo + jhi - WJ + 2) // 2, 0, res - WJ)
    return j0, ok


def _zwindow_bounds(bzi: jax.Array, act: jax.Array, res: int):
    """(k0, ok): _ZSHIFT-aligned WZ-cell z-band covering the active cells.

    The start is aligned down so it indexes a :func:`zwin_table` variant;
    alignment costs up to ``_ZSHIFT - 1`` cells of span budget (coverage is
    checked against ``k0``, not ``klo``).
    """
    klo = jnp.min(jnp.where(act, bzi, res))
    khi = jnp.max(jnp.where(act, bzi, -1))
    # centered like _window_bounds (symmetric sub-step headroom), then
    # aligned DOWN to an _ZSHIFT multiple so it indexes a zwin_table
    # variant; coverage is re-checked against the aligned k0, so alignment
    # can only flip ``ok`` to the fallback tier, never break coverage
    kc = jnp.clip((klo + khi - WZ + 2) // 2, 0, res - WZ)
    k0 = jnp.maximum((kc // _ZSHIFT) * _ZSHIFT, 0)
    ok = jnp.logical_and(
        jnp.logical_and(khi - k0 <= WZ - 2, k0 <= klo), khi >= 0
    )
    return k0, ok


def _sample_grad_tile_win(tt_ref, pts: jax.Array, active: jax.Array,
                          res: int, ttz_ref=None):
    """Windowed value + spatial gradient; falls back to the full table.

    Same outputs as :func:`_sample_grad_tile`; the three A-matrix matmuls
    (value, d/dy, d/dz) share one dynamically sliced table window when the
    active rows' y-cells span <= :data:`WJ` cells — or, with ``ttz_ref``, a
    two-axis (y, z) :func:`zwin_table` window when the z cells also fit.
    """
    (bx, by, bz), (fx, fy, fz) = _bases_fracs(pts, res)
    byi = by.astype(jnp.int32)
    j0, ok = _window_bounds(byi, active > 0.0, res)
    xx = _one_hot_pair(bx, fx, res)
    dxx = _d_one_hot_pair(bx, res)
    s = (res - 1) * 0.5
    q = pts.shape[0]
    bzi = bz.astype(jnp.int32)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (q, res), 1)
    v64 = jnp.where(k_iota == bzi, 1.0 - fz, 0.0) + jnp.where(
        k_iota == bzi + 1, fz, 0.0
    )
    ones64 = jnp.ones((q, 1), jnp.float32)
    dv64 = jnp.where(k_iota == bzi, -ones64, 0.0) + jnp.where(
        k_iota == bzi + 1, ones64, 0.0
    )

    def emit(m, mdy, mdz):
        value = jnp.sum(m * xx, axis=1, keepdims=True)
        gx = jnp.sum(m * dxx, axis=1, keepdims=True) * s
        gy = jnp.sum(mdy * xx, axis=1, keepdims=True) * s
        gz = jnp.sum(mdz * xx, axis=1, keepdims=True) * s
        return value, jnp.concatenate([gx, gy, gz], axis=1)

    def win(_):
        jw = _win_iota(q, res)
        rel = byi - j0
        u = jnp.where(jw == rel, 1.0 - fy, 0.0) + jnp.where(
            jw == rel + 1, fy, 0.0
        )
        du = jnp.where(jw == rel, -1.0, 0.0) + jnp.where(
            jw == rel + 1, 1.0, 0.0
        )
        rv = pltpu.repeat(v64, WJ, axis=1)
        rdv = pltpu.repeat(dv64, WJ, axis=1)
        tw = tt_ref[pl.ds(j0 * res, WJ * res), :]
        mm = lambda a: jnp.dot(a, tw, preferred_element_type=jnp.float32,
                               precision=_MM_PRECISION)
        return emit(mm(u * rv), mm(du * rv), mm(u * rdv))

    def full(_):
        j_idx, _ = _jk_iota(q, res)
        u = jnp.where(j_idx == byi, 1.0 - fy, 0.0) + jnp.where(
            j_idx == byi + 1, fy, 0.0
        )
        du = jnp.where(j_idx == byi, -1.0, 0.0) + jnp.where(
            j_idx == byi + 1, 1.0, 0.0
        )
        rv = pltpu.repeat(v64, res, axis=1)
        rdv = pltpu.repeat(dv64, res, axis=1)
        mm = lambda a: jnp.dot(a, tt_ref[:], preferred_element_type=jnp.float32,
                               precision=_MM_PRECISION)
        return emit(mm(u * rv), mm(du * rv), mm(u * rdv))

    y_tier = lambda _: jax.lax.cond(ok, win, full, 0)
    if ttz_ref is None or not _ZWIN:
        return y_tier(0)

    k0, kz_ok = _zwindow_bounds(bzi, active > 0.0, res)
    yz_ok = jnp.logical_and(ok, kz_ok)
    jzw, kzw = _zwin_lane_fields(q)

    def yz(_):
        row0 = (k0 // _ZSHIFT) * (res * WZ) + j0 * WZ
        tw = ttz_ref[pl.ds(row0, WJ * WZ), :]
        rel = byi - j0
        rk = bzi - k0
        u = jnp.where(jzw == rel, 1.0 - fy, 0.0) + jnp.where(
            jzw == rel + 1, fy, 0.0
        )
        du = jnp.where(jzw == rel, -1.0, 0.0) + jnp.where(
            jzw == rel + 1, 1.0, 0.0
        )
        vz = jnp.where(kzw == rk, 1.0 - fz, 0.0) + jnp.where(
            kzw == rk + 1, fz, 0.0
        )
        dvz = jnp.where(kzw == rk, -1.0, 0.0) + jnp.where(
            kzw == rk + 1, 1.0, 0.0
        )
        mm = lambda a: jnp.dot(a, tw, preferred_element_type=jnp.float32,
                               precision=_MM_PRECISION)
        return emit(mm(u * vz), mm(du * vz), mm(u * dvz))

    return jax.lax.cond(yz_ok, yz, y_tier, 0)


def _sample_grad_kernel(s_ref, tt_ref, ttz_ref, pts_ref, mask_ref, out_ref,
                        grad_ref, *, res: int):
    @pl.when(pl.program_id(0) < s_ref[0])
    def _():
        mask = mask_ref[0]
        value, grad = _sample_grad_tile_win(tt_ref, pts_ref[0], mask, res,
                                            ttz_ref=ttz_ref)
        out_ref[0] = value * mask
        grad_ref[0] = grad * mask


def _compaction_prefetch(act_tile: jax.Array) -> jax.Array:
    """[count, mapped tile ids...] for active-tile grid compaction.

    Grid step t maps to the t-th active tile.  The callers pass a DYNAMIC
    grid of exactly ``count`` steps, so inactive tiles cost nothing at all;
    the mapped tail (last active index repeated) plus the ``program_id <
    count`` kernel guard keep the kernels correct in interpret mode or if a
    static grid is ever used.

    Dynamic grids are only safe because ``vmap`` never batches these
    pallas calls: compiled vmap over a dynamic grid produced WRONG depths
    on real TPU (3% of pixels from truncated/misassigned tiles) — one of
    the two batched-Mosaic miscompiles that forced the sequential vmap rule
    (:func:`_sequential_vmap`;
    tests/test_tpu_compiled.py::test_compiled_render_under_vmap).
    """
    n = act_tile.shape[0]
    count = jnp.sum(act_tile.astype(jnp.int32))
    order = jnp.argsort(jnp.logical_not(act_tile), stable=True).astype(
        jnp.int32
    )
    last = order[jnp.maximum(count - 1, 0)]
    mapped = jnp.where(jnp.arange(n) < count, order, last)
    return jnp.concatenate([count[None], mapped])


def _pad_points(points, mask, n, q):
    n_pad = ((n + q - 1) // q) * q
    pts = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(points.astype(jnp.float32))
    m = jnp.zeros((n_pad, 1), jnp.float32)
    if mask is None:
        m = m.at[:n].set(1.0)
    else:
        m = m.at[:n, 0].set(mask.astype(jnp.float32))
    return pts, m, n_pad


@functools.partial(jax.jit, static_argnames=("interpret",))
def sample_sdf_pallas(
    sdf: jax.Array,
    points: jax.Array,
    mask: Optional[jax.Array] = None,
    interpret=None,
) -> jax.Array:
    """Trilinear-sample an SDF at N normalized points (Pallas MXU kernel).

    Matches :func:`sdfest_tpu.ops.interpolation.sample_sdf` (extrapolating,
    clamped base cells); masked rows produce 0 and fully-masked tiles are
    skipped.

    Args:
        sdf: (res, res, res) grid.
        points: (N, 3) normalized object-space coordinates.
        mask: Optional (N,) validity mask.
    Returns:
        (N,) interpolated values.
    """
    impl = functools.partial(_sample_impl,
                             interpret=_resolve_interpret(interpret))
    if mask is None:
        return _sequential_vmap(lambda s, p: impl(s, p, None), sdf, points)
    return _sequential_vmap(impl, sdf, points, mask)


def _sample_impl(sdf, points, mask, *, interpret: bool):
    res = sdf.shape[0]
    n = points.shape[0]
    pts, m, n_pad = _pad_points(points, mask, n, Q)
    n_tiles = n_pad // Q
    m_t = m.reshape(n_tiles, Q, 1)
    act_tile = jnp.any(m_t[:, :, 0] > 0.0, axis=1)
    sprefetch = _compaction_prefetch(act_tile)
    remap = lambda t, s: (s[1 + t], 0, 0)
    table_z = zwin_table(sdf.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_sample_kernel, res=res),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(sprefetch[0],),
            in_specs=[
                pl.BlockSpec((res * res, res), lambda t, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(table_z.shape, lambda t, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Q, 3), remap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Q, 1), remap, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Q, 1), remap,
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, Q, 1), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(sprefetch,
      sdf_to_table(sdf.astype(jnp.float32)), table_z,
      pts.reshape(n_tiles, Q, 3), m_t)
    # never-visited tiles are uninitialized; their rows are all-masked -> 0
    row_act = jnp.broadcast_to(act_tile[:, None], (n_tiles, Q)).reshape(n_pad)
    return jnp.where(row_act, out.reshape(n_pad), 0.0)[:n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sample_sdf_grad_pallas(
    sdf: jax.Array,
    points: jax.Array,
    mask: Optional[jax.Array] = None,
    interpret=None,
) -> Tuple[jax.Array, jax.Array]:
    """Value and spatial gradient of trilinear sampling (Pallas kernel).

    Args:
        sdf: (res, res, res) grid.
        points: (N, 3) normalized coordinates.
        mask: Optional (N,) validity mask (masked rows -> zeros; fully
            masked tiles skipped).
    Returns:
        Tuple of values (N,) and gradients (N, 3) w.r.t. the normalized
        coordinates.
    """
    impl = functools.partial(_sample_grad_impl,
                             interpret=_resolve_interpret(interpret))
    if mask is None:
        return _sequential_vmap(lambda s, p: impl(s, p, None), sdf, points)
    return _sequential_vmap(impl, sdf, points, mask)


def _sample_grad_impl(sdf, points, mask, *, interpret: bool):
    res = sdf.shape[0]
    n = points.shape[0]
    # half-size tiles: the three (QG, res^2) A-matrices plus iota scratch
    # must fit VMEM alongside the table
    QG = int(_os.environ.get("SDFEST_QG", 128))
    pts, m, n_pad = _pad_points(points, mask, n, QG)
    n_tiles = n_pad // QG
    m_t = m.reshape(n_tiles, QG, 1)
    act_tile = jnp.any(m_t[:, :, 0] > 0.0, axis=1)
    sprefetch = _compaction_prefetch(act_tile)
    remap = lambda t, s: (s[1 + t], 0, 0)
    table_z = zwin_table(sdf.astype(jnp.float32))
    value, grad = pl.pallas_call(
        functools.partial(_sample_grad_kernel, res=res),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(sprefetch[0],),
            in_specs=[
                pl.BlockSpec((res * res, res), lambda t, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(table_z.shape, lambda t, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QG, 3), remap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QG, 1), remap, memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, QG, 1), remap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QG, 3), remap, memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, QG, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, QG, 3), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(sprefetch,
      sdf_to_table(sdf.astype(jnp.float32)), table_z,
      pts.reshape(n_tiles, QG, 3), m_t)
    row_act = jnp.broadcast_to(act_tile[:, None], (n_tiles, QG)).reshape(n_pad)
    value = jnp.where(row_act, value.reshape(n_pad), 0.0)
    grad = jnp.where(row_act[:, None], grad.reshape(n_pad, 3), 0.0)
    return value[:n], grad[:n]


# ---------------------------------------------------------------------------
# matmul-scatter: gradient of trilinear sampling w.r.t. the SDF grid
# ---------------------------------------------------------------------------


def _scatter_kernel(s_ref, pts_ref, cot_ref, grad_ref, *, res: int):
    """grad_Tt[j*res+k, i] += sum_q A[q, jk] * Xx[q, i] * cot[q].

    The transpose of the sampling matmul; sequential grid steps accumulate
    into the same output block.  Grid steps are compacted to tiles with a
    nonzero cotangent (scalar-prefetched index list); the zero-init at step
    0 runs unconditionally so an all-zero input still yields a zero grid.
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        grad_ref[:] = jnp.zeros_like(grad_ref)

    cot = cot_ref[0]  # (Q, 1)

    @pl.when(t < s_ref[0])
    def _():
        pts = pts_ref[0]
        (bx, by, bz), (fx, fy, fz) = _bases_fracs(pts, res)
        xx = _one_hot_pair(bx, fx, res)
        byi = by.astype(jnp.int32)
        j0, ok = _window_bounds(byi, jnp.abs(cot) > 0.0, res)
        xc = xx * cot
        q = pts.shape[0]
        bzi = bz.astype(jnp.int32)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (q, res), 1)
        v64 = jnp.where(k_iota == bzi, 1.0 - fz, 0.0) + jnp.where(
            k_iota == bzi + 1, fz, 0.0
        )

        # windowed transpose-matmul accumulates into a dynamically sliced
        # row band of the gradient table (rows with zero cotangent
        # contribute nothing in either branch)
        @pl.when(ok)
        def _():
            jw = _win_iota(q, res)
            rel = byi - j0
            u = jnp.where(jw == rel, 1.0 - fy, 0.0) + jnp.where(
                jw == rel + 1, fy, 0.0
            )
            a = u * pltpu.repeat(v64, WJ, axis=1)
            grad_ref[pl.ds(j0 * res, WJ * res), :] += jnp.dot(
                a.T, xc, preferred_element_type=jnp.float32,
                precision=_MM_PRECISION,
            )

        @pl.when(jnp.logical_not(ok))
        def _():
            j_idx, _ = _jk_iota(q, res)
            u = jnp.where(j_idx == byi, 1.0 - fy, 0.0) + jnp.where(
                j_idx == byi + 1, fy, 0.0
            )
            a = u * pltpu.repeat(v64, res, axis=1)
            grad_ref[:] += jnp.dot(
                a.T, xc, preferred_element_type=jnp.float32,
                precision=_MM_PRECISION,
            )


@functools.partial(jax.jit, static_argnames=("res", "interpret"))
def scatter_sdf_grad_pallas(
    points: jax.Array,
    cotangents: jax.Array,
    res: int = RES,
    interpret=None,
) -> jax.Array:
    """Gradient of :func:`sample_sdf_pallas` w.r.t. the SDF grid.

    Args:
        points: (N, 3) normalized sample coordinates.
        cotangents: (N,) output cotangents.
    Returns:
        (res, res, res) gradient grid (dense matmul accumulation, no
        scatter primitives).
    """
    return _sequential_vmap(
        functools.partial(_scatter_impl, res=res,
                          interpret=_resolve_interpret(interpret)),
        points, cotangents)


def _scatter_impl(points, cotangents, *, res: int, interpret: bool):
    n = points.shape[0]
    pts, _, n_pad = _pad_points(points, None, n, Q)
    cot = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(
        cotangents.astype(jnp.float32)
    )
    n_tiles = n_pad // Q
    cot_t = cot.reshape(n_tiles, Q, 1)
    act_tile = jnp.any(jnp.abs(cot_t[:, :, 0]) > 0.0, axis=1)
    sprefetch = _compaction_prefetch(act_tile)
    remap = lambda t, s: (s[1 + t], 0, 0)
    grad_table = pl.pallas_call(
        functools.partial(_scatter_kernel, res=res),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            # at least one step must run: step 0 zero-inits the output
            grid=(jnp.maximum(sprefetch[0], 1),),
            in_specs=[
                pl.BlockSpec((1, Q, 3), remap, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Q, 1), remap, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((res * res, res), lambda t, s: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((res * res, res), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(sprefetch, pts.reshape(n_tiles, Q, 3), cot_t)
    return table_grad_to_sdf(grad_table, res)
