"""Golden-image regression tests.

The reference has no golden tests (SURVEY.md §4); the deterministic
counter-based RNG makes them cheap here: tiny renders of representative
scenes are pinned to stored arrays. A legitimate algorithm change must
regenerate them (`python tests/test_golden.py regen`).
"""

import os

import numpy as np
import pytest

from raytracer_weekend_tpu import integrator
from raytracer_weekend_tpu.camera import make_camera
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.scene import builder as B

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _cases():
    ground = B.Lambertian(B.Checker(B.SolidColor((0.2, 0.3, 0.1)),
                                    B.SolidColor((0.9, 0.9, 0.9)), 10.0))
    cases = {}

    objs = [
        B.Sphere((0, -1000, 0), 1000.0, ground),
        B.Sphere((0, 1, 0), 1.0, B.Dielectric(1.5)),
        B.Sphere((0, 1, 0), -0.95, B.Dielectric(1.5)),
        B.Sphere((2.2, 1, 0), 1.0, B.Metal((0.7, 0.6, 0.5), 0.1)),
        B.Sphere((-2.2, 1, 0), 1.0, B.Lambertian((0.4, 0.2, 0.1))),
    ]
    cfg = RenderConfig(width=24, height=12, samples_per_pixel=8, max_depth=8,
                       seed=7)
    cam = make_camera((8, 1.5, 2), (0, 1, 0), (0, 1, 0), 25.0,
                      cfg.aspect_ratio, 0.05, 8.0, 0.0, 1.0)
    cases["hero_spheres"] = (objs, (0.7, 0.8, 1.0), cfg, cam)

    white = B.Lambertian((0.73, 0.73, 0.73))
    objs = [
        B.YZRectangle(0, 5, 0, 5, 5, B.Lambertian((0.12, 0.45, 0.15))),
        B.YZRectangle(0, 5, 0, 5, 0, B.Lambertian((0.65, 0.05, 0.05))),
        B.XZRectangle(0, 5, 0, 5, 0, white),
        B.XZRectangle(0, 5, 0, 5, 5, white),
        B.XYRectangle(0, 5, 0, 5, 5, white),
        B.XZRectangle(1.5, 3.5, 1.5, 3.5, 4.99, B.DiffuseLight((7, 7, 7))),
        B.Cuboid((0, 0, 0), (1.4, 2.8, 1.4), white)
         .rotate_y(15).translate((2.6, 0, 2.9)),
        B.ConstantMedium(
            B.Cuboid((0, 0, 0), (1.4, 1.4, 1.4), white)
             .rotate_y(-18).translate((1.2, 0, 0.6)),
            0.4, B.SolidColor((1.0, 1.0, 1.0))),
    ]
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=16, max_depth=8,
                       seed=3)
    cam = make_camera((2.5, 2.5, -6), (2.5, 2.5, 0), (0, 1, 0), 40.0, 1.0,
                      0.0, 10.0, 0.0, 1.0)
    cases["cornell_smoke"] = (objs, (0.0, 0.0, 0.0), cfg, cam)

    objs = [
        B.Sphere((0, -1000, 0), 1000.0, B.Lambertian(B.NoiseTexture(4.0))),
        B.Triangle.flat_shaded(((-3, 0, 3), (0, 4, 0), (3, 0, -3)),
                               B.Lambertian(B.UVDebug())),
    ]
    cfg = RenderConfig(width=20, height=10, samples_per_pixel=8, max_depth=6,
                       seed=9)
    cam = make_camera((10, 2, 3), (0, 1.5, 0), (0, 1, 0), 30.0,
                      cfg.aspect_ratio, 0.0, 10.0, 0.0, 1.0)
    cases["perlin_triangle"] = (objs, (0.7, 0.8, 1.0), cfg, cam)

    return cases


def _render(case):
    objs, bg, cfg, cam = case
    scene, static = B.build_scene(objs, background=bg, seed=cfg.seed)
    return np.asarray(integrator.render_image(scene, static, cfg, cam))


@pytest.mark.parametrize("name", sorted(_cases()))
def test_golden(name):
    """Bootstrap mode: a missing golden is written on first run (delete the
    .npy under tests/golden/ to regenerate after a deliberate change)."""
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    img = _render(_cases()[name])
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3, "degenerate all-black golden render"
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
        return
    golden = np.load(path)
    np.testing.assert_allclose(img, golden, rtol=1e-4, atol=1e-4)
