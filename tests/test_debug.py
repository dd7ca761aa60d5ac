"""Scene validation + finite-render checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_weekend_tpu.camera import make_camera
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.scene import builder as B
from raytracer_weekend_tpu.utils.debug import (
    SceneValidationError, check_render_finite, validate_scene,
)


def _scene():
    objs = [
        B.Sphere((0, 0, -2), 0.5, B.Lambertian((0.5, 0.5, 0.5))),
        B.Sphere((1, 0, -2), 0.5, B.Metal((0.8, 0.8, 0.8), 0.3)),
    ]
    return B.build_scene(objs)


def test_valid_scene_passes():
    scene, static = _scene()
    validate_scene(scene, static)


def test_nan_center_rejected():
    scene, static = _scene()
    bad = scene._replace(spheres=scene.spheres._replace(
        c0=scene.spheres.c0.at[0, 0].set(jnp.nan)))
    with pytest.raises(SceneValidationError, match="NaN"):
        validate_scene(bad, static)


def test_bad_material_index_rejected():
    scene, static = _scene()
    bad = scene._replace(spheres=scene.spheres._replace(
        mat=scene.spheres.mat.at[0].set(99)))
    with pytest.raises(SceneValidationError, match="out of range"):
        validate_scene(bad, static)


def test_oversized_fuzz_rejected():
    scene, static = _scene()
    bad = scene._replace(materials=scene.materials._replace(
        fuzz=scene.materials.fuzz.at[1].set(2.0)))
    with pytest.raises(SceneValidationError, match="fuzz"):
        validate_scene(bad, static)


def test_check_render_finite():
    scene, static = _scene()
    cfg = RenderConfig(width=8, height=4, samples_per_pixel=1, max_depth=2)
    cam = make_camera((0, 0, 1), (0, 0, -2), (0, 1, 0), 40.0, 2.0, 0.0, 3.0,
                      0.0, 1.0)
    colors = check_render_finite(scene, static, cfg, cam)
    assert np.isfinite(colors).all()
