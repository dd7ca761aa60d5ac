"""Aux subsystems: inverse-rendering loop, checkpoint/resume, metrics."""

import os

import jax.numpy as jnp
import numpy as np

from raytracer_weekend_tpu import integrator
from raytracer_weekend_tpu.camera import make_camera
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.scene import builder as B
from raytracer_weekend_tpu.train import InverseRenderer
from raytracer_weekend_tpu.utils.checkpoint import TileStore, render_resumable
from raytracer_weekend_tpu.utils.metrics import (
    measured_render, wavefront_occupancy,
)


def _setup():
    objs = [
        B.Sphere((0, -100.5, -1), 100.0, B.Lambertian((0.8, 0.8, 0.0))),
        B.Sphere((0, 0, -1), 0.5, B.Lambertian((0.1, 0.2, 0.5))),
    ]
    scene, static = B.build_scene(objs, background=(0.6, 0.7, 0.9))
    cfg = RenderConfig(width=8, height=4, samples_per_pixel=2, max_depth=3,
                       seed=5)
    cam = make_camera((0, 0.2, 1.2), (0, 0, -1), (0, 1, 0), 50.0, 2.0, 0.0,
                      2.0, 0.0, 1.0)
    return scene, static, cfg, cam


def test_inverse_renderer_recovers_albedo():
    scene, static, cfg, cam = _setup()
    ir = InverseRenderer(static, cfg, cam, target=None, learning_rate=0.05)
    ir.target = ir._render(scene)

    perturbed = scene._replace(textures=scene.textures._replace(
        color1=scene.textures.color1.at[1].set(jnp.asarray([0.9, 0.9, 0.9]))))
    out, history = ir.fit(perturbed, steps=10)
    assert history[-1] < history[0]
    assert np.isfinite(history).all()
    # Integer tables untouched.
    np.testing.assert_array_equal(np.asarray(out.materials.mtype),
                                  np.asarray(scene.materials.mtype))
    # Albedo moved toward the true value (started at 0.9,0.9,0.9).
    moved = np.asarray(out.textures.color1[1])
    assert (moved < 0.9).all()


def test_tile_store_resume(tmp_path):
    scene, static, cfg, cam = _setup()
    ref = np.asarray(integrator.render_image(scene, static, cfg, cam))

    store = TileStore(str(tmp_path / "tiles"))
    img1 = render_resumable(scene, static, cfg, cam, store, tile_pixels=8)
    np.testing.assert_allclose(img1, ref, atol=1e-5)

    # Drop one tile; resume re-renders only the missing piece.
    victims = [f for f in os.listdir(store.root) if f.endswith(".npy")]
    os.remove(os.path.join(store.root, victims[0]))
    rendered = []
    img2 = render_resumable(scene, static, cfg, cam, store, tile_pixels=8,
                            progress=lambda a, b: rendered.append(a))
    np.testing.assert_allclose(img2, ref, atol=1e-5)

    # Mismatched config is refused.
    cfg2 = RenderConfig(width=8, height=4, samples_per_pixel=4, max_depth=3)
    try:
        render_resumable(scene, static, cfg2, cam, store, tile_pixels=8)
        raise AssertionError("expected config-mismatch ValueError")
    except ValueError:
        pass


def test_measured_render_and_occupancy():
    scene, static, cfg, cam = _setup()
    stats = measured_render(scene, static, cfg, cam)
    assert stats.primary_rays == cfg.n_rays
    assert stats.ray_segments >= cfg.n_rays  # every lane traces >= 1 segment
    assert 1.0 <= stats.mean_path_length <= cfg.max_depth
    line = stats.json_line(config="test")
    assert "segments_per_s" in line

    occ = wavefront_occupancy(scene, static, cfg, cam, n_lanes=64)
    assert occ[0] == 1.0            # all primaries alive at bounce 0
    assert (np.diff(occ) <= 1e-6).all()  # attrition is monotone
