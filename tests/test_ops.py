"""Hit-kernel unit tests vs closed forms and scalar oracles."""

import jax.numpy as jnp
import numpy as np

from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.ops import (
    hit_rects, hit_spheres, hit_triangles, rect_record, sphere_record,
    triangle_record,
)
from raytracer_weekend_tpu.ops.sphere import sphere_uv
from raytracer_weekend_tpu.scene import builder as B


def _spheres(rows):
    scene, _ = B.build_scene(
        [B.Sphere(c, r, B.Lambertian((0.5, 0.5, 0.5))) for c, r in rows])
    return scene.spheres


def test_sphere_axis_hit():
    sp = _spheres([((0, 0, -5), 1.0)])
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx = hit_spheres(sp, o, d, jnp.zeros(1), 1e-3)
    np.testing.assert_allclose(np.asarray(t), [4.0], atol=1e-5)
    p, outward, u, v, mat = sphere_record(sp, idx, o, d, jnp.zeros(1), t)
    np.testing.assert_allclose(np.asarray(p), [[0, 0, -4]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(outward), [[0, 0, 1]], atol=1e-5)


def test_sphere_closest_of_many(rng):
    # 64 random spheres, 128 random rays: compare against a numpy brute force.
    centers = rng.normal(size=(64, 3)) * 5
    radii = rng.uniform(0.2, 1.5, size=64)
    sp = _spheres([(tuple(c), r) for c, r in zip(centers, radii)])
    o = rng.normal(size=(128, 3)) * 8
    d = rng.normal(size=(128, 3))
    t, idx = hit_spheres(sp, jnp.asarray(o, jnp.float32),
                         jnp.asarray(d, jnp.float32), jnp.zeros(128), 1e-3)
    t = np.asarray(t)

    # scalar oracle (float64): allow a couple of knife-edge lanes to disagree
    # where a grazing hit flips between f32 and f64 discriminant signs.
    mismatches = 0
    for b in range(128):
        best = np.inf
        for s in range(64):
            oc = o[b] - centers[s]
            a = d[b] @ d[b]
            hb = oc @ d[b]
            c = oc @ oc - radii[s] ** 2
            disc = hb * hb - a * c
            if disc <= 0:
                continue
            sq = np.sqrt(disc)
            for root in [(-hb - sq) / a, (-hb + sq) / a]:
                if 1e-3 <= root < best:
                    best = root
                    break
        both_inf = not np.isfinite(t[b]) and not np.isfinite(best)
        if not both_inf and not np.isclose(t[b], best, rtol=2e-3, atol=2e-4):
            mismatches += 1
    assert mismatches <= 3, f"{mismatches} lanes disagree with the oracle"


def test_negative_radius_flips_normal():
    # Hollow-glass inner shell (scenes.rs:90-94): normal points inward.
    sp = _spheres([((0, 0, -5), -1.0)])
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx = hit_spheres(sp, o, d, jnp.zeros(1), 1e-3)
    np.testing.assert_allclose(np.asarray(t), [4.0], atol=1e-5)
    _, outward, _, _, _ = sphere_record(sp, idx, o, d, jnp.zeros(1), t)
    np.testing.assert_allclose(np.asarray(outward), [[0, 0, -1]], atol=1e-5)


def test_moving_sphere_center_lerp():
    scene, _ = B.build_scene([
        B.MovingSphere((0, 0, -5), 0.0, (2, 0, -5), 1.0, 1.0,
                       B.Lambertian((0.5, 0.5, 0.5)))])
    o = jnp.zeros((2, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 2)
    time = jnp.asarray([0.0, 1.0])
    t, idx = hit_spheres(scene.spheres, o, d, time, 1e-3)
    t = np.asarray(t)
    np.testing.assert_allclose(t[0], 4.0, atol=1e-5)  # centered at x=0
    assert not np.isfinite(t[1])                       # moved to x=2: miss


def test_sphere_uv_cardinal_points():
    # Values from the reference comment block (spherical.rs:64-69).
    pts = jnp.asarray([
        [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
    ], jnp.float32)
    u, v = sphere_uv(pts)
    # atol 2e-4: the pole-clip gradient guard (ops/sphere.py sphere_uv)
    # offsets v by ~1.4e-4 exactly at the +-y poles.
    np.testing.assert_allclose(
        np.asarray(u), [0.5, 0.0, 0.5, 0.5, 0.25, 0.75], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(v), [0.5, 0.5, 1.0, 0.0, 0.5, 0.5], atol=2e-4)


def test_rect_hits_and_uv():
    scene, _ = B.build_scene([
        B.XYRectangle(0.0, 2.0, 0.0, 4.0, -1.0, B.Lambertian((1, 1, 1))),
        B.XZRectangle(0.0, 2.0, 0.0, 4.0, -1.0, B.Lambertian((1, 1, 1))),
        B.YZRectangle(0.0, 2.0, 0.0, 4.0, -1.0, B.Lambertian((1, 1, 1))),
    ])
    rc = scene.rects
    o = jnp.asarray([[0.5, 1.0, 5.0], [0.5, 5.0, 1.0], [5.0, 0.5, 1.0]],
                    jnp.float32)
    d = jnp.asarray([[0, 0, -1], [0, -1, 0], [-1, 0, 0]], jnp.float32)
    t, idx = hit_rects(rc, o, d, 1e-3)
    np.testing.assert_allclose(np.asarray(t), [6.0, 6.0, 6.0], atol=1e-5)
    # Table order is Morton-sorted at build time; check each ray hit the
    # rect with its expected fixed axis rather than a literal table index.
    np.testing.assert_array_equal(np.asarray(rc.axis)[np.asarray(idx)],
                                  [2, 1, 0])
    p, outward, u, v, _ = rect_record(rc, idx, o, d, t)
    np.testing.assert_allclose(np.asarray(u), [0.25, 0.25, 0.25], atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), [0.25, 0.25, 0.25], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(outward), [[0, 0, 1], [0, 1, 0], [1, 0, 0]], atol=1e-6)


def test_rect_miss_outside_bounds():
    scene, _ = B.build_scene([
        B.XYRectangle(0.0, 2.0, 0.0, 4.0, -1.0, B.Lambertian((1, 1, 1)))])
    o = jnp.asarray([[3.0, 1.0, 5.0], [0.5, 1.0, 5.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1], [0, 0, 1]], jnp.float32)  # outside; wrong way
    t, _ = hit_rects(scene.rects, o, d, 1e-3)
    assert not np.isfinite(np.asarray(t)).any()


def test_triangle_vs_scalar_oracle(rng):
    tris = []
    for _ in range(32):
        v = rng.normal(size=(3, 3)) * 2
        tris.append(B.Triangle.flat_shaded(v, B.Lambertian((1, 1, 1))))
    scene, _ = B.build_scene(tris)
    o = rng.normal(size=(64, 3)) * 4
    d = rng.normal(size=(64, 3))
    t, idx = hit_triangles(scene.triangles, jnp.asarray(o, jnp.float32),
                           jnp.asarray(d, jnp.float32), 1e-3)
    t = np.asarray(t)

    tr = scene.triangles
    v0 = np.asarray(tr.v0, np.float64)
    v1 = np.asarray(tr.v1, np.float64)
    v2 = np.asarray(tr.v2, np.float64)
    for b in range(64):
        best = np.inf
        for i in range(32):
            ab, ac = v1[i] - v0[i], v2[i] - v0[i]
            n = np.cross(ab, ac)
            det = -(d[b] @ n)
            if det == 0:
                continue
            ao = o[b] - v0[i]
            aoxd = np.cross(ao, d[b])
            u = (ac @ aoxd) / det
            vv = -(ab @ aoxd) / det
            tt = (ao @ n) / det
            if tt >= 1e-3 and tt >= 0 and u >= 0 and vv >= 0 and u + vv <= 1:
                best = min(best, tt)
        if np.isfinite(best):
            np.testing.assert_allclose(t[b], best, rtol=2e-3, atol=2e-3)
        else:
            assert not np.isfinite(t[b])


def test_triangle_barycentric_interpolation():
    tri = B.Triangle(
        vertices=((0, 0, 0), (2, 0, 0), (0, 2, 0)),
        material=B.Lambertian((1, 1, 1)),
        normals=((0, 0, 1), (1, 0, 0), (0, 1, 0)),
        uvs=((0, 0), (1, 0), (0, 1)),
    )
    scene, _ = B.build_scene([tri])
    o = jnp.asarray([[0.5, 0.5, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    t, idx = hit_triangles(scene.triangles, o, d, 1e-3)
    np.testing.assert_allclose(np.asarray(t), [5.0], atol=1e-5)
    p, n, u, v, _ = triangle_record(scene.triangles, idx, o, d, t)
    # Barycentric u = v = 0.25 at (0.5, 0.5).
    np.testing.assert_allclose(np.asarray(u), [0.25], atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), [0.25], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(n), [[0.25, 0.25, 0.5]], atol=1e-5)  # 0.5*n0+0.25*n1+0.25*n2
