"""Replay-based custom VJP for the fused megakernel (fused_diff.py).

The forward is the fused Pallas kernel emitting per-bounce winner codes;
the backward re-traces the saved paths with the staged path's own
differentiable code (integrator.replay_rays). These tests pin:
  * replay(saved paths) reproduces the fused image,
  * jax.grad through the custom VJP matches the staged-path gradient,
  * the sharded train step runs the fused path and reduces the loss.
"""

import jax
import pytest
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from raytracer_weekend_tpu import integrator
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.fused_diff import render_fused_diff
from raytracer_weekend_tpu.models.scenes import (
    cornell_box, smokey_cornell_box, two_spheres)
from raytracer_weekend_tpu.ops.pallas.megakernel import render_fused
from raytracer_weekend_tpu.scene import builder as B


def _setup(scenef, width=16, height=12, spp=2, depth=5, seed=3,
           use_pallas=False):
    cfg = RenderConfig(width=width, height=height, samples_per_pixel=spp,
                       max_depth=depth, seed=seed, use_pallas=use_pallas)
    objs, cams, bg = scenef(cfg.aspect_ratio)
    scene, static = B.build_scene(objs, background=bg, seed=cfg.seed)
    return cfg, scene, static, cams[0]


def test_replay_reproduces_fused_forward():
    """Volume + sphere + planar families: re-tracing the saved winner codes
    gives the fused image back (up to fp reassociation in t)."""
    for scenef in (two_spheres, smokey_cornell_box):
        cfg, scene, static, cam = _setup(scenef)
        n = cfg.n_rays
        seed_u = jnp.uint32(cfg.seed)
        rad_f, _, codes = render_fused(scene, cfg, cam, 0, n, seed_u,
                                       interpret=True, static=static,
                                       emit_paths=True)
        ids = jnp.arange(n, dtype=jnp.int32)
        o, d, t, rid = integrator._pixel_rays(cam, cfg, ids, seed_u)
        rad_r = integrator.replay_rays(scene, static, cfg, o, d, t, rid,
                                       seed_u, codes)
        np.testing.assert_allclose(np.asarray(rad_f), np.asarray(rad_r),
                                   rtol=1e-4, atol=1e-4)


def test_fused_grad_matches_staged_grad():
    """d mean(radiance) / d scene through the custom VJP equals the staged
    path's gradient (same winner-detached semantics) on every float leaf."""
    cfg, scene, static, cam = _setup(cornell_box, width=16, height=16)
    n = cfg.n_rays
    seed_u = jnp.uint32(cfg.seed)
    ids = jnp.arange(n, dtype=jnp.int32)
    o, d, t, rid = integrator._pixel_rays(cam, cfg, ids, seed_u)

    def loss_fused(scene):
        r = render_fused_diff(scene, static, cfg, cam, 0, n, seed_u,
                              interpret=True)
        return jnp.mean(r)

    def loss_staged(scene):
        r = integrator.trace_rays(scene, static, cfg, o, d, t, rid, seed_u)
        return jnp.mean(r)

    gf = jax.grad(loss_fused, allow_int=True)(scene)
    gs = jax.grad(loss_staged, allow_int=True)(scene)
    for a, b in zip(jtu.tree_leaves(gf), jtu.tree_leaves(gs)):
        if getattr(a, "dtype", None) == jax.dtypes.float0:
            continue
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / scale < 5e-3


@pytest.mark.slow
def test_train_step_fused_reduces_loss():
    """End-to-end: sharded train step dispatches through the fused VJP
    (use_pallas=True, ray-axis-only mesh) and the loss drops."""
    from raytracer_weekend_tpu.parallel import make_render_mesh, train_step

    cfg, scene, static, cam = _setup(two_spheres, width=16, height=12, spp=2,
                                     depth=4, use_pallas=True)
    assert integrator.fused_eligible(static, cfg)
    rmesh = make_render_mesh((2, 1, 1))
    target = integrator.render_image(scene, static, cfg, cam)
    target = target / cfg.samples_per_pixel
    # Perturb an albedo and recover it.
    perturbed = scene._replace(textures=scene.textures._replace(
        color1=scene.textures.color1 + 0.2))
    losses = []
    s = perturbed
    for _ in range(3):
        s, loss = train_step(s, static, cfg, cam, target, rmesh, lr=2.0)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_rows_gather_and_vjp_exact():
    """replay._rows: forward must equal tab[idx] bitwise and the custom
    MXU-transposed backward must equal the scatter-add gradient bitwise on
    exact backends (ADVICE r3 high: a DEFAULT-precision one-hot forward
    rounded geometry rows to bf16 on TPU). The bf16 mantissa-split pieces
    must also reconstruct the cotangent exactly — the TPU-exactness
    precondition, checkable on any backend."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raytracer_weekend_tpu import replay
    from raytracer_weekend_tpu.ops.pallas.megakernel import _bf16_trunc

    rng = np.random.default_rng(7)
    tab = jnp.asarray(rng.normal(size=(37, 21)).astype(np.float32) * 278.0)
    idx = jnp.asarray(rng.integers(0, 37, size=256), dtype=jnp.int32)
    g = jnp.asarray(rng.normal(size=(256, 21)).astype(np.float32))

    np.testing.assert_array_equal(np.asarray(replay._rows(tab, idx)),
                                  np.asarray(tab[idx]))

    # Unique indices: every per-lane contribution is exact (the three
    # mantissa pieces are disjoint bit ranges, so any summation order
    # reconstructs g bitwise) -> gradient must equal scatter-add bitwise.
    uidx = jnp.asarray(rng.permutation(37)[:21], dtype=jnp.int32)
    gu = jnp.asarray(rng.normal(size=(21, 21)).astype(np.float32))
    ref_u = jax.vjp(lambda t: t[uidx], tab)[1](gu)[0]
    got_u = jax.vjp(lambda t: replay._rows(t, uidx), tab)[1](gu)[0]
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(ref_u))

    # Duplicate indices accumulate; the MXU sum is a pure reassociation of
    # the scatter-add's (exact terms, different order) -> close, not
    # bitwise.
    ref = jax.vjp(lambda t: t[idx], tab)[1](g)[0]
    got = jax.vjp(lambda t: replay._rows(t, idx), tab)[1](g)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)

    gh = _bf16_trunc(g)
    gm = _bf16_trunc(g - gh)
    gl = g - gh - gm
    np.testing.assert_array_equal(np.asarray(gh + gm + gl), np.asarray(g))
    # Each piece must be exactly bf16-representable.
    for piece in (gh, gm):
        rt = piece.astype(jnp.bfloat16).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(piece))


def test_replay_bwd_kernel_matches_xla_replay():
    """The fused Pallas replay backward (ops/pallas/replay_bwd.py) must
    produce the same gradients as jax.vjp of the XLA replay it replaces,
    on an eligible (sphere-only, solid/checker) scene. Geometry/fuzz/ior
    cotangents are structurally zero for such scenes (gradient signal
    enters only through colors/background products); the live color and
    background rows must agree to float tolerance and everything must be
    NaN-free."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np
    from raytracer_weekend_tpu.config import RenderConfig
    from raytracer_weekend_tpu.fused_diff import render_fused_diff
    from raytracer_weekend_tpu.integrator import _pixel_rays, replay_rays
    from raytracer_weekend_tpu.models.scenes import generate_scene
    from raytracer_weekend_tpu.ops.pallas.megakernel import render_fused

    scene, static, cams = generate_scene("jumpy_balls", 16 / 9)
    cfg = RenderConfig(width=24, height=14, samples_per_pixel=2, max_depth=4)
    cam = cams[0]
    seed = jnp.uint32(0)
    n = cfg.n_rays

    def loss(sc):
        rad = render_fused_diff(sc, static, cfg, cam, 0, n, seed,
                                interpret=True)
        return jnp.sum(rad * rad)

    g_k = jax.grad(loss, allow_int=True)(scene)

    rad, _, codes = render_fused(scene, cfg, cam, 0, n, seed,
                                 interpret=True, static=static,
                                 emit_paths=True)
    g_out = 2.0 * rad
    leaves, treedef = jtu.tree_flatten(scene)
    mask = [jnp.issubdtype(jnp.asarray(le).dtype, jnp.floating)
            for le in leaves]
    fl = [le for le, m in zip(leaves, mask) if m]

    def replay_f(fl):
        it = iter(fl)
        full = [next(it) if m else le for le, m in zip(leaves, mask)]
        sc = jtu.tree_unflatten(treedef, full)
        ids = jnp.arange(n, dtype=jnp.int32)
        o, d, tm, rid = _pixel_rays(cam, cfg, ids, seed)
        return replay_rays(sc, static, cfg, o, d, tm, rid, seed, codes)

    _, vjp = jax.vjp(replay_f, fl)
    ref_fl = vjp(g_out)[0]
    got_fl = [le for le, m in zip(jtu.tree_leaves(g_k), mask) if m]
    for ref, got in zip(ref_fl, got_fl):
        a, b = np.asarray(ref), np.asarray(got)
        assert not np.isnan(b).any()
        if a.size == 0:
            continue
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=max(scale, 1.0) * 2e-5)


def test_replay_bwd_kernel_planar_mixed_matches_xla_replay():
    """Round-5 kernel scope: mixed sphere + rect + smooth-shaded triangle
    scene with checker/metal/dielectric/light — the fused Pallas replay
    backward must match jax.vjp of the XLA replay on every float leaf,
    including triangle vertex/normal cotangents (the planar interpolated-
    normal chain) and rect extents."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np
    from raytracer_weekend_tpu.config import RenderConfig
    from raytracer_weekend_tpu.fused_diff import render_fused_diff
    from raytracer_weekend_tpu.integrator import _pixel_rays, replay_rays
    from raytracer_weekend_tpu.ops.pallas.megakernel import render_fused
    from raytracer_weekend_tpu.camera import make_camera

    objs = [
        B.Sphere((0, -100.5, -1), 100.0,
                 B.Lambertian(B.Checker(B.SolidColor((0.2, 0.3, 0.1)),
                                        B.SolidColor((0.9, 0.9, 0.9)), 8.0))),
        B.MovingSphere((0, 0, -1), 0.0, (0, 0.2, -1), 1.0, 0.5,
                       B.Lambertian((0.1, 0.2, 0.5))),
        B.Sphere((-1, 0, -1), 0.5, B.Dielectric(1.5)),
        B.Sphere((1, 0, -1), 0.5, B.Metal((0.8, 0.6, 0.2), 0.3)),
        B.Triangle(((-2.0, 0.0, -2.5), (2.0, 0.0, -2.5), (0.0, 2.0, -2.5)),
                   B.Metal((0.7, 0.7, 0.9), 0.1),
                   normals=((0.2, 0.1, 1.0), (-0.1, 0.3, 1.0),
                            (0.0, -0.2, 1.0))),
        B.XYRectangle(-0.5, 0.5, 1.0, 1.8, -2.0, B.DiffuseLight((3, 3, 3))),
        B.XZRectangle(-1.5, 1.5, -2.2, 0.2, 1.9,
                      B.Lambertian((0.6, 0.3, 0.3))),
    ]
    scene, static = B.build_scene(objs, background=(0.6, 0.7, 0.9), seed=2,
                                  bvh=False)
    assert static.n_spheres and static.n_rects and static.n_triangles
    cfg = RenderConfig(width=24, height=14, samples_per_pixel=2, max_depth=4)
    cam = make_camera((0, 0.6, 1.8), (0, 0.3, -1), (0, 1, 0), 60.0,
                      24 / 14, 0.02, 2.5, 0.0, 1.0)
    seed = jnp.uint32(0)
    n = cfg.n_rays

    def loss(sc):
        rad = render_fused_diff(sc, static, cfg, cam, 0, n, seed,
                                interpret=True)
        return jnp.sum(rad * rad)

    g_k = jax.grad(loss, allow_int=True)(scene)

    rad, _, codes = render_fused(scene, cfg, cam, 0, n, seed,
                                 interpret=True, static=static,
                                 emit_paths=True)
    g_out = 2.0 * rad
    leaves, treedef = jtu.tree_flatten(scene)
    mask = [jnp.issubdtype(jnp.asarray(le).dtype, jnp.floating)
            for le in leaves]
    fl = [le for le, m in zip(leaves, mask) if m]

    def replay_f(fl):
        it = iter(fl)
        full = [next(it) if m else le for le, m in zip(leaves, mask)]
        sc = jtu.tree_unflatten(treedef, full)
        ids = jnp.arange(n, dtype=jnp.int32)
        o, d, tm, rid = _pixel_rays(cam, cfg, ids, seed)
        return replay_rays(sc, static, cfg, o, d, tm, rid, seed, codes)

    _, vjp = jax.vjp(replay_f, fl)
    ref_fl = vjp(g_out)[0]
    got_fl = [le for le, m in zip(jtu.tree_leaves(g_k), mask) if m]
    checked = 0
    for ref, got in zip(ref_fl, got_fl):
        a, b = np.asarray(ref), np.asarray(got)
        assert not np.isnan(b).any()
        if a.size == 0:
            continue
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=max(scale, 1.0) * 3e-5)
        if scale > 0:
            checked += 1
    # Solid/checker radiance is a product of path-constant colors, so
    # geometry/fuzz/IOR cotangents are STRUCTURALLY zero (both sides; the
    # allclose above pins the kernel's zeros to tight atol). The live
    # leaves are the texture colors and the background.
    assert checked >= 3


@pytest.mark.parametrize("scene_name", ["earth", "two_perlin_spheres",
                                        "simple_light"])
def test_replay_bwd_kernel_deferred_matches_xla_replay(scene_name):
    """Deferred-texture scenes (noise/image): the fused replay backward —
    kernel + jax.vjp of the deferred combine — must match jax.vjp of the
    XLA replay on every float leaf. Unlike solid/checker scenes these have
    LIVE geometry gradients (the marble depends continuously on the hit
    point; texel gradients scatter into the image atlas), so this
    exercises the kernel's quadratic/planar reverse chains end to end."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np
    from raytracer_weekend_tpu.config import RenderConfig
    from raytracer_weekend_tpu.fused_diff import render_fused_diff
    from raytracer_weekend_tpu.integrator import _pixel_rays, replay_rays
    from raytracer_weekend_tpu.models.scenes import generate_scene
    from raytracer_weekend_tpu.ops.pallas.megakernel import render_fused

    scene, static, cams = generate_scene(scene_name, 16 / 9)
    assert static.has_noise or static.has_image
    cfg = RenderConfig(width=24, height=14, samples_per_pixel=2, max_depth=4)
    cam = cams[0]
    seed = jnp.uint32(0)
    n = cfg.n_rays

    def loss(sc):
        rad = render_fused_diff(sc, static, cfg, cam, 0, n, seed,
                                interpret=True)
        return jnp.sum(rad * rad)

    g_k = jax.grad(loss, allow_int=True)(scene)

    rad, _, codes = render_fused(scene, cfg, cam, 0, n, seed,
                                 interpret=True, static=static,
                                 emit_paths=True)
    g_out = 2.0 * rad
    leaves, treedef = jtu.tree_flatten(scene)
    mask = [jnp.issubdtype(jnp.asarray(le).dtype, jnp.floating)
            for le in leaves]
    fl = [le for le, m in zip(leaves, mask) if m]

    def replay_f(fl):
        it = iter(fl)
        full = [next(it) if m else le for le, m in zip(leaves, mask)]
        sc = jtu.tree_unflatten(treedef, full)
        ids = jnp.arange(n, dtype=jnp.int32)
        o, d, tm, rid = _pixel_rays(cam, cfg, ids, seed)
        return replay_rays(sc, static, cfg, o, d, tm, rid, seed, codes)

    _, vjp = jax.vjp(replay_f, fl)
    ref_fl = vjp(g_out)[0]
    got_fl = [le for le, m in zip(jtu.tree_leaves(g_k), mask) if m]
    live = 0
    # Noise scenes: the kernel path evaluates the marble at the
    # megakernel-RECORDED hit point while the replay recomputes it; the
    # two differ by fp reassociation at the 1e-4 level (the same spread
    # test_replay_reproduces_fused_forward accepts), and the 7-octave
    # turbulence derivative amplifies input jitter ~60x at first order
    # (measured: a 1e-6 global jitter moves the reference c0 gradient by
    # 6e-5 relative — round-5 probe). Geometry leaves therefore agree in
    # direction (cosine pinned below) with a few-percent magnitude
    # spread; smooth leaves (colors, Perlin table, background) agree to
    # ~1e-3 or better.
    tol = 6e-2 if static.has_noise else 5e-5
    for ref, got in zip(ref_fl, got_fl):
        a, b = np.asarray(ref), np.asarray(got)
        assert not np.isnan(b).any()
        if a.size == 0:
            continue
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=max(scale, 1.0) * tol)
        if scale > 0:
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            cos = float((a * b).sum() / (na * nb + 1e-30))
            assert cos > 0.998, cos
            live += 1
    # Live gradient surface: nearest-image scenes expose texels +
    # background (geometry structurally zero); noise scenes additionally
    # expose sphere centers/radii, colors, scale, and the Perlin table.
    assert live >= (4 if static.has_noise else 2), live
