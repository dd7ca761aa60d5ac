"""Counter-based RNG and closed-form sampler statistics.

Validates that the closed-form samplers reproduce the distributions of the
reference's rejection loops (vec3.rs:101-131), per SURVEY.md §7's test plan.
"""

import jax.numpy as jnp
import numpy as np

from raytracer_weekend_tpu import rng as rt


def _uniforms(n, salt=123):
    ids = jnp.arange(n, dtype=jnp.uint32)
    return np.asarray(rt.rand4(7, ids, 0, salt))


def test_rand4_range_and_moments():
    u = _uniforms(20000)
    assert u.shape == (20000, 4)
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(u.var() - 1 / 12) < 5e-3


def test_rand4_deterministic_and_batch_invariant():
    ids = jnp.arange(1000, dtype=jnp.uint32)
    a = np.asarray(rt.rand4(7, ids, 3, 99))
    b = np.asarray(rt.rand4(7, ids, 3, 99))
    np.testing.assert_array_equal(a, b)
    # Lane value depends only on the counter, not on batch shape/order.
    half = np.asarray(rt.rand4(7, ids[500:], 3, 99))
    np.testing.assert_array_equal(a[500:], half)


def test_rand4_salt_decorrelation():
    u1 = _uniforms(20000, salt=1)[:, 0]
    u2 = _uniforms(20000, salt=2)[:, 0]
    assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.02


def test_unit_vector_distribution():
    u = _uniforms(30000)
    v = np.asarray(rt.unit_vector_from_uniforms(
        jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
    norms = np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # Uniform on the sphere: each coordinate has mean 0, var 1/3.
    assert np.abs(v.mean(0)).max() < 0.02
    np.testing.assert_allclose(v.var(0), 1 / 3, atol=0.02)


def test_in_unit_sphere_distribution():
    u = _uniforms(30000)
    v = np.asarray(rt.in_unit_sphere_from_uniforms(
        jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]), jnp.asarray(u[:, 2])))
    r = np.linalg.norm(v, axis=-1)
    assert (r < 1.0 + 1e-6).all()
    # Uniform in ball: P(R < r) = r^3, so R^3 ~ U(0,1).
    r3 = np.sort(r**3)
    ks = np.abs(r3 - np.arange(1, len(r3) + 1) / len(r3)).max()
    assert ks < 0.01
    assert np.abs(v.mean(0)).max() < 0.02


def test_in_unit_disk_distribution():
    u = _uniforms(30000)
    v = np.asarray(rt.in_unit_disk_from_uniforms(
        jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
    assert (v[:, 2] == 0).all()
    r = np.linalg.norm(v[:, :2], axis=-1)
    assert (r < 1.0 + 1e-6).all()
    r2 = np.sort(r**2)  # P(R < r) = r^2 in the disk
    ks = np.abs(r2 - np.arange(1, len(r2) + 1) / len(r2)).max()
    assert ks < 0.01
