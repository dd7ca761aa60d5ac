"""Branchless scatter vs the per-BSDF reference semantics."""

import jax.numpy as jnp
import numpy as np

from raytracer_weekend_tpu import materials as M
from raytracer_weekend_tpu.scene import builder as B


def _scene_with(material):
    scene, _ = B.build_scene([B.Sphere((0, 0, 0), 1.0, material)])
    return scene


def _scatter(scene, mat_id, d, normal, front_face=True, n=1):
    B_ = d.shape[0]
    return M.scatter(
        scene.materials, scene.textures,
        jnp.full((B_,), mat_id, jnp.int32),
        d, jnp.zeros((B_, 3)), normal,
        jnp.full((B_,), front_face),
        jnp.zeros(B_), jnp.zeros(B_),
        jnp.uint32(0), jnp.arange(B_, dtype=jnp.uint32), jnp.uint32(0),
        has_noise=False, has_image=False,
    )


def test_lambertian_cosine_lobe_and_albedo():
    scene = _scene_with(B.Lambertian((0.3, 0.5, 0.7)))
    n = 20000
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    out = _scatter(scene, 0, d, normal)
    dirs = np.array(out.direction)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # normal + unit vector is the cosine-weighted lobe: pdf ∝ cos(theta),
    # so E[cos theta] = 2/3 (vs 1/2 for uniform hemisphere).
    assert (dirs[:, 2] > -1e-6).all()
    np.testing.assert_allclose(dirs[:, 2].mean(), 2 / 3, atol=0.01)
    np.testing.assert_allclose(np.asarray(out.attenuation)[0], [0.3, 0.5, 0.7],
                               atol=1e-6)
    assert np.asarray(out.alive).all()
    np.testing.assert_allclose(np.asarray(out.emitted), 0.0, atol=1e-7)


def test_metal_mirror_fuzz0():
    scene = _scene_with(B.Metal((0.8, 0.8, 0.8), 0.0))
    d = jnp.asarray([[1.0, 0.0, -1.0]])
    normal = jnp.asarray([[0.0, 0.0, 1.0]])
    out = _scatter(scene, 0, d, normal)
    expect = np.array([1.0, 0.0, 1.0]) / np.sqrt(2)  # reflect(unit(d), n)
    np.testing.assert_allclose(np.asarray(out.direction)[0], expect, atol=1e-6)
    assert np.asarray(out.alive)[0]


def test_metal_absorbs_below_surface():
    # Grazing ray + large fuzz: some scatters go below the surface and die
    # (material.rs:86-94).
    scene = _scene_with(B.Metal((0.8, 0.8, 0.8), 1.0))
    n = 4000
    d = jnp.tile(jnp.asarray([[1.0, 0.0, -0.02]]), (n, 1))
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    out = _scatter(scene, 0, d, normal)
    alive = np.asarray(out.alive)
    assert 0.1 < alive.mean() < 0.9


def test_dielectric_total_internal_reflection():
    scene = _scene_with(B.Dielectric(1.5))
    # Inside glass (front_face=False -> ratio=1.5), grazing: TIR forced.
    d = jnp.asarray([[1.0, 0.0, -0.1]])
    normal = jnp.asarray([[0.0, 0.0, 1.0]])
    out = _scatter(scene, 0, d, normal, front_face=False)
    got = np.asarray(out.direction)[0]
    ud = np.array([1.0, 0.0, -0.1]) / np.linalg.norm([1.0, 0.0, -0.1])
    expect = ud - 2 * (ud @ [0, 0, 1]) * np.array([0, 0, 1.0])
    np.testing.assert_allclose(got, expect, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.attenuation)[0], 1.0, atol=1e-7)


def test_dielectric_refraction_statistics():
    # Normal incidence from outside at ior=1.5: Schlick R0 = 0.04, so ~4%
    # of lanes reflect, the rest refract straight through.
    scene = _scene_with(B.Dielectric(1.5))
    n = 20000
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    out = _scatter(scene, 0, d, normal)
    dirs = np.asarray(out.direction)
    reflected = dirs[:, 2] > 0
    assert abs(reflected.mean() - 0.04) < 0.01


def test_diffuse_light_emits_and_terminates():
    scene = _scene_with(B.DiffuseLight((4.0, 3.0, 2.0)))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    normal = jnp.asarray([[0.0, 0.0, 1.0]])
    out = _scatter(scene, 0, d, normal)
    np.testing.assert_allclose(np.asarray(out.emitted)[0], [4, 3, 2], atol=1e-6)
    assert not np.asarray(out.alive)[0]
    np.testing.assert_allclose(np.asarray(out.attenuation)[0], 0.0, atol=1e-7)


def test_isotropic_uniform_ball():
    scene, _ = B.build_scene([B.ConstantMedium(
        B.Sphere((0, 0, 0), 1.0, B.Lambertian((1, 1, 1))), 1.0,
        B.SolidColor((0.5, 0.5, 0.5)))])
    # material row 1 is the interned Isotropic phase function.
    iso_row = int(np.argmax(np.asarray(scene.materials.mtype) == M.ISOTROPIC))
    n = 20000
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    out = M.scatter(
        scene.materials, scene.textures,
        jnp.full((n,), iso_row, jnp.int32), d, jnp.zeros((n, 3)), normal,
        jnp.ones(n, bool), jnp.zeros(n), jnp.zeros(n),
        jnp.uint32(0), jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0),
        has_noise=False, has_image=False)
    dirs = np.asarray(out.direction)
    r = np.linalg.norm(dirs, axis=-1)
    assert (r < 1 + 1e-5).all()
    assert np.abs(dirs.mean(0)).max() < 0.02  # isotropic
    np.testing.assert_allclose(np.asarray(out.attenuation)[0], 0.5, atol=1e-6)
