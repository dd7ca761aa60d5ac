import jax.numpy as jnp
import numpy as np

from raytracer_weekend_tpu import vecmath as vm


def test_reflect_matches_formula(rng):
    v = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    n = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    n = vm.normalize(n)
    out = np.asarray(vm.reflect(v, n))
    expect = np.asarray(v) - 2 * np.sum(np.asarray(v) * np.asarray(n), -1,
                                        keepdims=True) * np.asarray(n)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_reflect_preserves_length_and_flips_normal_component(rng):
    v = vm.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    n = vm.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    r = vm.reflect(v, n)
    np.testing.assert_allclose(np.asarray(vm.length(r)), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(vm.dot(r, n)), -np.asarray(vm.dot(v, n)), atol=1e-5)


def test_refract_snells_law(rng):
    # Incoming unit vectors against +z normal, from outside (cos > 0).
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 64, jnp.float32)
    v = vm.normalize(jnp.asarray(
        np.concatenate([rng.normal(size=(64, 2)),
                        -np.abs(rng.normal(size=(64, 1))) - 0.5], -1),
        jnp.float32))
    eta = 1.0 / 1.5
    out = np.asarray(vm.refract(v, n, eta))
    sin_in = np.linalg.norm(np.asarray(v)[:, :2], axis=-1)
    sin_out = np.linalg.norm(out[:, :2], axis=-1)
    np.testing.assert_allclose(sin_out, eta * sin_in, atol=1e-5)
    # Refracted rays continue into the surface (negative z).
    assert (out[:, 2] < 0).all()


def test_near_zero():
    a = jnp.asarray([[1e-9, 1e-9, 1e-9], [1e-3, 0, 0]])
    assert np.asarray(vm.near_zero(a)).tolist() == [True, False]
