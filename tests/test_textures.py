"""Texture + Perlin tests."""

import jax.numpy as jnp
import numpy as np

from raytracer_weekend_tpu import perlin
from raytracer_weekend_tpu import textures as TX
from raytracer_weekend_tpu.scene import builder as B


def _table(texs):
    # Build a throwaway scene with one lambertian per texture to intern them.
    objs = [B.Sphere((0, 0, 0), 1.0, B.Lambertian(t)) for t in texs]
    scene, _ = B.build_scene(objs)
    return scene.textures


def test_solid_and_uvdebug():
    table = _table([B.SolidColor((0.1, 0.2, 0.3)), B.UVDebug()])
    p = jnp.zeros((2, 3))
    u = jnp.asarray([0.7, 0.7])
    v = jnp.asarray([0.3, 0.3])
    out = np.asarray(TX.texture_value(table, jnp.asarray([0, 1]), u, v, p,
                                      has_noise=False, has_image=False))
    np.testing.assert_allclose(out[0], [0.1, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.7, 0.3, 0.0], atol=1e-6)


def test_checker_sign_product():
    # texture.rs:71-80: sines = sin(f x) sin(f y) sin(f z); odd where < 0.
    table = _table([B.Checker(B.SolidColor((1, 1, 1)), B.SolidColor((0, 0, 0)),
                              10.0)])
    pts = np.array([[0.05, 0.05, 0.05],    # all sines positive -> even
                    [-0.05, 0.05, 0.05]])  # one negative -> odd
    out = np.asarray(TX.texture_value(
        table, jnp.zeros(2, jnp.int32), jnp.zeros(2), jnp.zeros(2),
        jnp.asarray(pts, jnp.float32), has_noise=False, has_image=False))
    np.testing.assert_allclose(out[0], [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 0, 0], atol=1e-6)


def test_image_nearest_fetch_flips_v():
    # 2x2 image: distinct corner colors; V flipped (image_texture.rs:37).
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = [1, 0, 0]  # top-left
    img[0, 1] = [0, 1, 0]  # top-right
    img[1, 0] = [0, 0, 1]  # bottom-left
    img[1, 1] = [1, 1, 0]  # bottom-right
    table = _table([B.ImageTexture(data=img)])
    uv = [(0.1, 0.9), (0.9, 0.9), (0.1, 0.1), (0.9, 0.1)]
    u = jnp.asarray([a for a, _ in uv])
    v = jnp.asarray([b for _, b in uv])
    out = np.asarray(TX.texture_value(
        table, jnp.zeros(4, jnp.int32), u, v, jnp.zeros((4, 3)),
        has_noise=False, has_image=True))
    # v=0.9 -> top rows, v=0.1 -> bottom rows.
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(out[3], [1, 1, 0], atol=1e-6)


def test_perlin_scalar_oracle(rng):
    grad, perm = perlin.make_perlin_tables(3)
    pts = rng.uniform(-10, 10, size=(50, 3)).astype(np.float32)
    got = np.asarray(perlin.noise(jnp.asarray(grad), jnp.asarray(perm),
                                  jnp.asarray(pts)))

    # Scalar transliteration of perlin.rs:50-75 + 91-122.
    def scalar_noise(p):
        base = np.floor(p).astype(np.int64)
        frac = p - np.floor(p)
        u = frac * frac * (3.0 - 2.0 * frac)
        accum = 0.0
        for i in range(2):
            for j in range(2):
                for k in range(2):
                    ix = (base[0] + i) & 255
                    iy = (base[1] + j) & 255
                    iz = (base[2] + k) & 255
                    h = (perm[0][ix] ^ perm[1][iy] ^ perm[2][iz]) & 255
                    g = grad[h]
                    w = u - np.array([i, j, k])
                    c = np.array([i, j, k])
                    blend = np.prod(c * u + (1 - c) * (1 - u))
                    accum += blend * (g @ w)
        return accum

    expect = np.array([scalar_noise(p.astype(np.float64)) for p in pts])
    np.testing.assert_allclose(got, expect, atol=2e-3)


def test_perlin_range_and_turbulence():
    grad, perm = perlin.make_perlin_tables(0)
    g = jnp.asarray(grad)
    pm = jnp.asarray(perm)
    pts = jnp.asarray(np.random.default_rng(0).uniform(-5, 5, (2000, 3)),
                      jnp.float32)
    n = np.asarray(perlin.noise(g, pm, pts))
    assert np.abs(n).max() <= 1.0 + 1e-3
    t = np.asarray(perlin.turbulence(g, pm, pts, 7))
    assert (t >= 0).all()
    assert t.max() > 0.1  # not degenerate
