"""Golden-image regression tests.

The reference has no golden tests (SURVEY.md §4); the deterministic
counter-based RNG makes them cheap here: tiny renders of every catalog
scene (console_app/src/scenes.rs:41-61, all 13) plus three synthetic
feature-dense cases are pinned to committed arrays.

STRICT: a missing golden FAILS. To (re)generate after a deliberate
rendering change:

    RTW_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py -q

then commit the changed .npy files under tests/golden/.
"""

import os

import numpy as np
import pytest

from raytracer_weekend_tpu import integrator
from raytracer_weekend_tpu.camera import make_camera
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.models.scenes import SCENES
from raytracer_weekend_tpu.scene import builder as B

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = os.environ.get("RTW_REGEN_GOLDEN") == "1"

# Catalog scenes: every entry of the reference's scene switch
# (console_app/src/scenes.rs:41-61) at a tiny deterministic config.
_BIG = {"book2_final_scene", "animated_book2_final_scene",
        "wavefront_cow_obj", "wavefront_suspension_obj",
        "textured_monument"}


def _catalog_case(name):
    small = name not in _BIG
    cfg = RenderConfig(width=24 if small else 20, height=14 if small else 12,
                       samples_per_pixel=4 if small else 2,
                       max_depth=6 if small else 5, seed=11)
    objs, cams, bg = SCENES[name](cfg.aspect_ratio)
    return objs, bg, cfg, cams[0]


def _synthetic_cases():
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


def _check(name, img):
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3, "degenerate all-black golden render"
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
        return
    if not os.path.exists(path):
        pytest.fail(f"missing golden {path}; regenerate with "
                    f"RTW_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py"
                    f" and commit the .npy")
    golden = np.load(path)
    np.testing.assert_allclose(img, golden, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", sorted(_synthetic_cases()))
def test_golden_synthetic(name):
    _check(name, _render(_synthetic_cases()[name]))


@pytest.mark.parametrize("name", sorted(SCENES))
def test_golden_catalog(name):
    _check(f"catalog_{name}", _render(_catalog_case(name)))
