"""Unit tests for quaternion ops (mirrors reference test_quaternion.py intent)."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from sdfest_tpu.ops import quaternion


def test_multiply_matches_scipy(rng):
    q1 = Rotation.random(10, random_state=1).as_quat()  # scalar-last
    q2 = Rotation.random(10, random_state=2).as_quat()
    got = np.asarray(quaternion.multiply(jnp.asarray(q1), jnp.asarray(q2)))
    want = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
    # quaternions are sign-ambiguous
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-6)


def test_apply_matches_scipy(rng):
    q = Rotation.random(10, random_state=3).as_quat()
    pts = rng.normal(size=(10, 3))
    got = np.asarray(quaternion.apply(jnp.asarray(q), jnp.asarray(pts)))
    want = Rotation.from_quat(q).apply(pts)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_to_rotation_matrix_matches_apply(rng):
    q = Rotation.random(5, random_state=4).as_quat()
    pts = rng.normal(size=(5, 3))
    rot = quaternion.to_rotation_matrix(jnp.asarray(q))
    via_matrix = np.einsum("nij,nj->ni", np.asarray(rot), pts)
    via_apply = np.asarray(quaternion.apply(jnp.asarray(q), jnp.asarray(pts)))
    np.testing.assert_allclose(via_matrix, via_apply, atol=1e-6)


def test_invert_roundtrip(rng):
    q = jnp.asarray(Rotation.random(4, random_state=5).as_quat())
    pts = jnp.asarray(rng.normal(size=(4, 3)))
    roundtrip = quaternion.apply(quaternion.invert(q), quaternion.apply(q, pts))
    np.testing.assert_allclose(np.asarray(roundtrip), np.asarray(pts), atol=1e-6)


def test_geodesic_distance():
    q1 = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    half = np.sin(np.pi / 8)
    q2 = jnp.asarray([[half, 0.0, 0.0, np.cos(np.pi / 8)]])  # 45deg about x
    d = quaternion.geodesic_distance(q1, q2)
    np.testing.assert_allclose(np.asarray(d), [np.pi / 4], atol=1e-6)
    # antipodal representation has zero distance
    d0 = quaternion.geodesic_distance(q1, -q1)
    np.testing.assert_allclose(np.asarray(d0), [0.0], atol=1e-6)


def test_random_uniform_is_normalized():
    q = quaternion.random_uniform(jax.random.PRNGKey(0), (100,))
    norms = np.linalg.norm(np.asarray(q), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_simple_quaternion_loss_zero_for_same():
    q = jnp.asarray(Rotation.random(8, random_state=6).as_quat())
    loss = quaternion.simple_quaternion_loss(q, q)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)
    loss_anti = quaternion.simple_quaternion_loss(q, -q)
    np.testing.assert_allclose(float(loss_anti), 0.0, atol=1e-6)
