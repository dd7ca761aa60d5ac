"""Pallas intersection kernels vs the jnp reference paths (interpret mode).

On the CPU test backend the kernels run under
pltpu.force_tpu_interpret_mode(), checking the kernel math and the custom
VJP; the real Mosaic compilation is exercised by bench.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from raytracer_weekend_tpu.ops import hit_spheres, hit_triangles
from raytracer_weekend_tpu.ops.pallas import (
    hit_spheres_pallas, hit_triangles_pallas,
)
from raytracer_weekend_tpu.scene import builder as B


def _sphere_scene(rng, n=50):
    objs = []
    for _ in range(n - 1):
        c = rng.normal(size=3) * 6
        objs.append(B.Sphere(tuple(c), rng.uniform(0.3, 1.2),
                             B.Lambertian((0.5, 0.5, 0.5))))
    objs.append(B.MovingSphere((0, 0, -4), 0.0, (1, 0, -4), 1.0, 0.7,
                               B.Lambertian((0.5, 0.5, 0.5))))
    scene, _ = B.build_scene(objs)
    return scene


def test_sphere_kernel_matches_jnp(rng):
    scene = _sphere_scene(rng)
    o = jnp.asarray(rng.normal(size=(100, 3)) * 8, jnp.float32)
    d = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    time = jnp.asarray(rng.uniform(0, 1, 100), jnp.float32)
    t_ref, i_ref = hit_spheres(scene.spheres, o, d, time, 1e-3)
    with pltpu.force_tpu_interpret_mode():
        t_pl, i_pl = hit_spheres_pallas(scene.spheres, o, d, time, 1e-3)
    np.testing.assert_allclose(np.asarray(t_pl), np.asarray(t_ref),
                               rtol=2e-3, atol=1e-4)
    hit = np.isfinite(np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(i_pl)[hit],
                                  np.asarray(i_ref)[hit])


def test_sphere_kernel_custom_vjp(rng):
    scene = _sphere_scene(rng, n=10)
    o = jnp.asarray(rng.normal(size=(32, 3)) * 6, jnp.float32)
    d = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    time = jnp.zeros(32)

    def loss_pl(c0):
        sp = scene.spheres._replace(c0=c0, c1=c0)
        with pltpu.force_tpu_interpret_mode():
            t, _ = hit_spheres_pallas(sp, o, d, time, 1e-3)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    def loss_ref(c0):
        sp = scene.spheres._replace(c0=c0, c1=c0)
        t, _ = hit_spheres(sp, o, d, time, 1e-3)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    g_pl = np.asarray(jax.grad(loss_pl)(scene.spheres.c0))
    g_ref = np.asarray(jax.grad(loss_ref)(scene.spheres.c0))
    np.testing.assert_allclose(g_pl, g_ref, rtol=1e-3, atol=1e-4)


def _tri_scene(rng, n=40):
    tris = []
    for _ in range(n):
        base = rng.normal(size=3) * 3
        v = base + rng.normal(size=(3, 3))
        tris.append(B.Triangle.flat_shaded(v, B.Lambertian((1, 1, 1))))
    scene, _ = B.build_scene(tris, bvh=False)
    return scene


def test_triangle_kernel_matches_jnp(rng):
    scene = _tri_scene(rng)
    o = jnp.asarray(rng.normal(size=(100, 3)) * 4, jnp.float32)
    d = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    t_ref, i_ref = hit_triangles(scene.triangles, o, d, 1e-3)
    with pltpu.force_tpu_interpret_mode():
        t_pl, i_pl = hit_triangles_pallas(scene.triangles, o, d, 1e-3)
    np.testing.assert_allclose(np.asarray(t_pl), np.asarray(t_ref),
                               rtol=2e-3, atol=1e-4)
    hit = np.isfinite(np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(i_pl)[hit],
                                  np.asarray(i_ref)[hit])


def test_triangle_kernel_custom_vjp(rng):
    scene = _tri_scene(rng, n=12)
    o = jnp.asarray(rng.normal(size=(32, 3)) * 4, jnp.float32)
    d = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)

    def loss_pl(v0):
        tr = scene.triangles._replace(v0=v0)
        with pltpu.force_tpu_interpret_mode():
            t, _ = hit_triangles_pallas(tr, o, d, 1e-3)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    def loss_ref(v0):
        tr = scene.triangles._replace(v0=v0)
        t, _ = hit_triangles(tr, o, d, 1e-3)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    g_pl = np.asarray(jax.grad(loss_pl)(scene.triangles.v0))
    g_ref = np.asarray(jax.grad(loss_ref)(scene.triangles.v0))
    np.testing.assert_allclose(g_pl, g_ref, rtol=1e-3, atol=1e-4)


def test_perlin_turbulence_pallas_matches_jnp():
    """The batched-lookup Pallas turbulence kernel (one perm matmul + one
    corner-gradient matmul per octave, round 5) must match the jnp
    reference path bit-close on arbitrary points."""
    import numpy as np
    import jax.numpy as jnp
    from raytracer_weekend_tpu import perlin
    from raytracer_weekend_tpu.ops.pallas.perlin_turb import turbulence_pallas

    g, pm = perlin.make_perlin_tables(3)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(5000, 3)).astype(np.float32) * 7)
    ref = perlin.turbulence(jnp.asarray(g), jnp.asarray(pm), p, 7)
    got = turbulence_pallas(jnp.asarray(g), jnp.asarray(pm), p, 7,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_perlin_turbulence_vjp_kernel_matches_autodiff():
    """The hand-derived turbulence VJP kernel (round 5) must match
    jax.vjp of the jnp turbulence for both d(gradient-table) and d(p)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from raytracer_weekend_tpu import perlin
    from raytracer_weekend_tpu.ops.pallas.perlin_turb import (
        turbulence_pallas_diff, turbulence_vjp_pallas)

    g, pm = perlin.make_perlin_tables(3)
    g, pm = jnp.asarray(g), jnp.asarray(pm)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(3000, 3)).astype(np.float32) * 7)
    ct = jnp.asarray(rng.normal(size=(3000,)).astype(np.float32))

    ref_out, vjp = jax.vjp(lambda g_, p_: perlin.turbulence(g_, pm, p_, 7),
                           g, p)
    dg_ref, dp_ref = vjp(ct)
    dg, dp = turbulence_vjp_pallas(g, pm, p, ct, 7, interpret=True)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_ref),
                               atol=1e-5)

    out2, vjp2 = jax.vjp(
        lambda g_, p_: turbulence_pallas_diff(g_, pm, p_, 7,
                                              interpret=True), g, p)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref_out),
                               atol=1e-5)
    dg2, dp2 = vjp2(ct)
    np.testing.assert_allclose(np.asarray(dg2), np.asarray(dg_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp2), np.asarray(dp_ref),
                               atol=1e-5)


def test_perlin_turbulence_vjp_kernel_live_mask():
    """VJP kernel with a real liveness mask at T > 8 tiles.

    Regression: when the forward went to per-row (T, 8) flags, the VJP
    kernel kept reading the old (1, T) layout — flags_ref[0, pid] — so
    every tile past the first was gated by tile-0's row flags and most
    live records' cotangents silently vanished (GRADPARITY two_perlin /
    simple_light failed with d_table == 0). live=None (all-ones) was
    blind to it; this pins the masked path: kernel(live) must equal
    jax.vjp of the jnp turbulence with dead records' cotangents zeroed.
    """
    import jax
    import numpy as np
    import jax.numpy as jnp
    from raytracer_weekend_tpu import perlin
    from raytracer_weekend_tpu.ops.pallas.perlin_turb import (
        turbulence_vjp_pallas)

    g, pm = perlin.make_perlin_tables(3)
    g, pm = jnp.asarray(g), jnp.asarray(pm)
    rng = np.random.default_rng(1)
    n = 12000                                    # 12 tiles of 1024
    p = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 7)
    ct = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    live = jnp.asarray((rng.random(n) < 0.3))    # clustered-dead-ish 30%

    _, vjp = jax.vjp(lambda g_, p_: perlin.turbulence(g_, pm, p_, 7),
                     g, p)
    dg_ref, dp_ref = vjp(ct * live.astype(jnp.float32))
    dg, dp = turbulence_vjp_pallas(g, pm, p, ct * live, 7,
                                   interpret=True, live=live)
    lv = np.asarray(live)[:, None]
    np.testing.assert_allclose(np.asarray(dp) * lv,
                               np.asarray(dp_ref) * lv, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_ref),
                               atol=1e-4)
    assert float(np.abs(np.asarray(dg)).max()) > 0.0
