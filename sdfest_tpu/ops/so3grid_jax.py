"""JAX (jit/vmap-compatible) SO(3) grid index math.

On-device twin of :mod:`sdfest_tpu.ops.so3grid` for code paths that need
quaternion -> grid-cell conversion inside jitted programs (e.g. the online
synthetic dataset's discretized orientation labels).  Matches the host
implementation bit-for-bit on cell assignments.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_JRLL = jnp.asarray([2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4])
_JPLL = jnp.asarray([1, 3, 5, 7, 0, 2, 4, 6, 1, 3, 5, 7])


def _spread_bits(v: jax.Array) -> jax.Array:
    v = v.astype(jnp.uint32)
    v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.uint32(0x33333333)
    v = (v | (v << 1)) & jnp.uint32(0x55555555)
    return v


def ang2pix_nest(nside: int, theta: jax.Array, phi: jax.Array) -> jax.Array:
    """Nested-scheme HEALPix ang2pix (power-of-two ``nside``), traceable."""
    z = jnp.cos(theta)
    za = jnp.abs(z)
    tt = jnp.mod(phi, 2 * jnp.pi) / (0.5 * jnp.pi)

    # equatorial
    temp1 = nside * (0.5 + tt)
    temp2 = nside * (z * 0.75)
    jp = jnp.floor(temp1 - temp2).astype(jnp.int32)
    jm = jnp.floor(temp1 + temp2).astype(jnp.int32)
    shift = max(int(nside).bit_length() - 1, 0)
    ifp = jp >> shift
    ifm = jm >> shift
    face_eq = jnp.where(
        ifp == ifm, (ifp & 3) + 4, jnp.where(ifp < ifm, ifp & 3, (ifm & 3) + 8)
    )
    ix_eq = jm & (nside - 1)
    iy_eq = nside - (jp & (nside - 1)) - 1

    # polar caps
    ntt = jnp.minimum(jnp.floor(tt), 3.0)
    tp = tt - ntt
    tmp = nside * jnp.sqrt(3.0 * (1.0 - za))
    jp_p = jnp.minimum(jnp.floor(tp * tmp).astype(jnp.int32), nside - 1)
    jm_p = jnp.minimum(jnp.floor((1.0 - tp) * tmp).astype(jnp.int32), nside - 1)
    north = z >= 0
    face_pol = jnp.where(north, ntt.astype(jnp.int32), ntt.astype(jnp.int32) + 8)
    ix_pol = jnp.where(north, nside - jm_p - 1, jp_p)
    iy_pol = jnp.where(north, nside - jp_p - 1, jm_p)

    equatorial = za <= 2.0 / 3.0
    face = jnp.where(equatorial, face_eq, face_pol)
    ix = jnp.where(equatorial, ix_eq, ix_pol)
    iy = jnp.where(equatorial, iy_eq, iy_pol)
    ipf = (_spread_bits(ix) | (_spread_bits(iy) << 1)).astype(jnp.int32)
    return face * nside * nside + ipf


def quat_to_hopf(quat: jax.Array):
    """Quaternion (scalar-last) -> Hopf coordinates (psi, theta, phi)."""
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    psi = 2.0 * jnp.arctan2(x, w)
    theta = 2.0 * jnp.arctan2(
        jnp.sqrt(z * z + y * y), jnp.sqrt(w * w + x * x)
    )
    phi = jnp.arctan2(z * w - x * y, y * w + x * z)
    two_pi = 2.0 * jnp.pi
    psi = jnp.mod(psi, two_pi)
    phi = jnp.mod(phi, two_pi)
    return psi, theta, phi


def quat_to_index(quat: jax.Array, resol: int) -> jax.Array:
    """Quaternion -> SO(3) grid cell index (traceable; ``resol`` static)."""
    psi, theta, phi = quat_to_hopf(quat)
    n_s1 = 6 * 2**resol
    nside = 2**resol
    n_s2 = 12 * nside * nside
    s1_index = jnp.floor(psi / (2 * jnp.pi / n_s1)).astype(jnp.int32)
    s1_index = jnp.clip(s1_index, 0, n_s1 - 1)
    s2_index = ang2pix_nest(nside, theta, phi)
    return s1_index * n_s2 + s2_index
