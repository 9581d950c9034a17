"""Quaternion operations (scalar-last convention), pure JAX.

Capability parity with the reference quaternion utilities
(/root/reference/sdfest/initialization/quaternion_utils.py), re-implemented as
jit/vmap/grad-compatible functional ops.  All quaternions use the scalar-last
``(x, y, z, w)`` convention and the scalar sign is not constrained.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Compose two rotations given as quaternions; broadcasting applies.

    Args:
        q1: Normalized quaternions, shape ``(..., 4)``, scalar-last.
        q2: Normalized quaternions, shape ``(..., 4)``, scalar-last.
    Returns:
        The quaternion of the composed rotation ``q1 * q2``.
    """
    ax, ay, az, aw = jnp.moveaxis(q1, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(q2, -1, 0)
    ox = aw * bx + ax * bw + ay * bz - az * by
    oy = aw * by - ax * bz + ay * bw + az * bx
    oz = aw * bz + ax * by - ay * bx + az * bw
    ow = aw * bw - ax * bx - ay * by - az * bz
    return jnp.stack((ox, oy, oz, ow), axis=-1)


def invert(q: jax.Array) -> jax.Array:
    """Invert unit quaternions (conjugate), shape ``(..., 4)``."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def apply(q: jax.Array, points: jax.Array) -> jax.Array:
    """Rotate points by quaternions; broadcasting applies.

    Args:
        q: Normalized quaternions, shape ``(..., 4)``, scalar-last.
        points: Points, shape ``(..., 3)``.
    Returns:
        Rotated points, shape broadcast of inputs.
    """
    p = jnp.concatenate([points, jnp.zeros_like(points[..., :1])], axis=-1)
    return multiply(multiply(q, p), invert(q))[..., :3]


def normalize(q: jax.Array, eps: float = 0.0) -> jax.Array:
    """Normalize quaternions to unit norm along the last axis."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
    return q / norm


def to_rotation_matrix(q: jax.Array) -> jax.Array:
    """Convert quaternions to rotation matrices.

    Args:
        q: Normalized quaternions, shape ``(..., 4)``, scalar-last.
    Returns:
        Rotation matrices, shape ``(..., 3, 3)``, such that
        ``R @ p == apply(q, p)``.
    """
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def geodesic_distance(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Geodesic distance (radians) between quaternions, shape ``(..., 4)``."""
    abs_q1q2 = jnp.clip(jnp.abs(jnp.sum(q1 * q2, axis=-1)), 0.0, 1.0)
    return 2.0 * jnp.arccos(abs_q1q2)


def simple_quaternion_loss(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Trig-free rotation distance: mean of ``1 - <q1, q2>^2``."""
    return jnp.mean(1.0 - jnp.sum(q1 * q2, axis=-1) ** 2)


def random_uniform(key: jax.Array, shape: tuple = (), dtype=jnp.float32) -> jax.Array:
    """Sample uniformly distributed unit quaternions (Shoemake 1992).

    Args:
        key: PRNG key.
        shape: Batch shape; the returned array has shape ``shape + (4,)``.
        dtype: Output dtype (float32 by default, the TPU compute dtype).
    """
    u = jax.random.uniform(key, shape + (3,), dtype=dtype)
    u1, u2, u3 = u[..., 0], u[..., 1], u[..., 2]
    two_pi = 2.0 * jnp.pi
    return jnp.stack(
        [
            jnp.sqrt(1.0 - u1) * jnp.sin(two_pi * u2),
            jnp.sqrt(1.0 - u1) * jnp.cos(two_pi * u2),
            jnp.sqrt(u1) * jnp.sin(two_pi * u3),
            jnp.sqrt(u1) * jnp.cos(two_pi * u3),
        ],
        axis=-1,
    )
