"""Scene save/load roundtrip."""

import numpy as np

from raytracer_weekend_tpu import integrator
from raytracer_weekend_tpu.camera import make_camera
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.scene import builder as B
from raytracer_weekend_tpu.scene.io import load_scene, save_scene


def test_scene_roundtrip_renders_identically(tmp_path, rng):
    objs = [
        B.Sphere((0, -100.5, -1), 100.0,
                 B.Lambertian(B.Checker(B.SolidColor((0.2, 0.3, 0.1)),
                                        B.SolidColor((0.9, 0.9, 0.9)), 10.0))),
        B.Sphere((0, 0, -1), 0.5, B.Dielectric(1.5)),
        B.Triangle.flat_shaded(((-2, 0, -2), (2, 0, -2), (0, 2, -2)),
                               B.Lambertian(B.UVDebug())),
        B.ConstantMedium(B.Sphere((1, 0.5, -1), 0.4,
                                  B.Lambertian((1, 1, 1))), 0.5,
                         B.SolidColor((0.5, 0.6, 0.7))),
    ]
    # Force a BVH so the optional fields roundtrip too.
    scene, static = B.build_scene(objs, background=(0.6, 0.7, 0.9), bvh=True)
    assert static.triangle_bvh

    path = str(tmp_path / "scene.npz")
    save_scene(path, scene, static)
    scene2, static2 = load_scene(path)
    assert static2 == static

    cfg = RenderConfig(width=8, height=4, samples_per_pixel=2, max_depth=3)
    cam = make_camera((0, 0.3, 1.5), (0, 0, -1), (0, 1, 0), 50.0, 2.0, 0.0,
                      2.0, 0.0, 1.0)
    a = np.asarray(integrator.render_image(scene, static, cfg, cam))
    b = np.asarray(integrator.render_image(scene2, static2, cfg, cam))
    np.testing.assert_allclose(a, b, atol=1e-6)
