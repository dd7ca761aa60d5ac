"""Rect Pallas kernel vs jnp path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from raytracer_weekend_tpu.ops import hit_rects
from raytracer_weekend_tpu.ops.pallas import hit_rects_pallas
from raytracer_weekend_tpu.scene import builder as B


def _rect_scene(rng, n=30):
    objs = []
    ctors = [B.XYRectangle, B.XZRectangle, B.YZRectangle]
    for i in range(n):
        a0, b0 = rng.uniform(-4, 2, 2)
        k = rng.uniform(-4, 4)
        objs.append(ctors[i % 3](a0, a0 + rng.uniform(0.5, 3),
                                 b0, b0 + rng.uniform(0.5, 3), k,
                                 B.Lambertian((1, 1, 1))))
    scene, _ = B.build_scene(objs)
    return scene


def test_rect_kernel_matches_jnp(rng):
    scene = _rect_scene(rng)
    o = jnp.asarray(rng.normal(size=(100, 3)) * 6, jnp.float32)
    d = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    t_ref, i_ref = hit_rects(scene.rects, o, d, 1e-3)
    with pltpu.force_tpu_interpret_mode():
        t_pl, i_pl = hit_rects_pallas(scene.rects, o, d, 1e-3)
    np.testing.assert_allclose(np.asarray(t_pl), np.asarray(t_ref),
                               rtol=2e-3, atol=1e-4)
    hit = np.isfinite(np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(i_pl)[hit],
                                  np.asarray(i_ref)[hit])


def test_rect_kernel_custom_vjp(rng):
    scene = _rect_scene(rng, n=9)
    o = jnp.asarray(rng.normal(size=(32, 3)) * 6, jnp.float32)
    d = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)

    def loss_pl(k):
        rc = scene.rects._replace(k=k)
        with pltpu.force_tpu_interpret_mode():
            t, _ = hit_rects_pallas(rc, o, d, 1e-3)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    def loss_ref(k):
        rc = scene.rects._replace(k=k)
        t, _ = hit_rects(rc, o, d, 1e-3)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    g_pl = np.asarray(jax.grad(loss_pl)(scene.rects.k))
    g_ref = np.asarray(jax.grad(loss_ref)(scene.rects.k))
    np.testing.assert_allclose(g_pl, g_ref, rtol=1e-3, atol=1e-4)
