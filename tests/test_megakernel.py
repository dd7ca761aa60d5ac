"""Fused megakernel (ops.pallas.megakernel) vs the staged wavefront path.

The megakernel re-implements the whole estimator — primary-ray generation
(camera.rs:66-74), sphere intersection (spherical.rs:18-60), scatter
(material.rs) — inside one Pallas kernel with an in-kernel PCG4D that must
reproduce rng.rand4 streams bit-for-bit. These tests pin that equivalence in
interpret mode on CPU; a handful of lanes may flip winners on near-tangent
hits (float reassociation between XLA and the kernel's op order), so the
comparison is segment-exact + per-lane with a small outlier allowance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_weekend_tpu import integrator
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.models.scenes import jumpy_balls, two_spheres, cornell_box
from raytracer_weekend_tpu.ops.pallas.megakernel import (
    fused_supported, render_fused)
from raytracer_weekend_tpu.scene import builder as B


def _compare(scenef, kw, width=32, height=18, spp=4, depth=6, seed=3):
    cfg = RenderConfig(width=width, height=height, samples_per_pixel=spp,
                       max_depth=depth, seed=seed, use_pallas=False)
    objs, cams, bg = scenef(cfg.aspect_ratio, **kw)
    scene, static = B.build_scene(objs, background=bg, seed=cfg.seed)
    assert static.fused_simple and fused_supported(static, cfg)

    n = cfg.n_rays
    ids = jnp.arange(n, dtype=jnp.int32)
    seed_u = jnp.uint32(cfg.seed)
    o, d, t, rid = integrator._pixel_rays(cams[0], cfg, ids, seed_u)
    ref, ref_seg = integrator.trace_rays(scene, static, cfg, o, d, t, rid,
                                         seed_u, return_stats=True)
    got, seg = render_fused(scene, cfg, cams[0], 0, n, seed_u,
                            interpret=True, static=static)
    return np.asarray(ref), int(ref_seg), np.asarray(got), np.asarray(seg), n


def test_two_spheres_matches_staged_path():
    # The kernel's MXU-factored quadratic (affine-center coefficients) rounds
    # differently from the staged path's classic form, so hit decisions can
    # flip on near-tangent rays: allow a tiny segment-count delta and a small
    # per-lane outlier budget instead of bit-exactness.
    ref, ref_seg, got, seg, n = _compare(two_spheres, {})
    assert abs(int(seg.sum()) - ref_seg) <= max(2, n // 500)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    bad_lanes = np.unique(np.argwhere(rel > 0.05)[:, 0])
    assert len(bad_lanes) <= max(2, n // 500)
    assert np.abs(got - ref).mean() < 1e-4


def test_jumpy_balls_matches_staged_path():
    ref, ref_seg, got, seg, n = _compare(jumpy_balls, {"seed": 0})
    # near-identical live-segment counts: same hit/miss/termination decisions
    # up to near-tangent winner flips (float reassociation, see above). The
    # K-split quadratic (round-3: 8-block bf16-piece products, ~1-2 ulp
    # reassociation vs the plain f32 dot) moves a handful more of the
    # hollow-glass shells' knife-edge re-intersections: ~1.2% of lanes at
    # this size, mean image error still < 1e-3.
    # Measured r4 (this config): seg_delta 3, bad_lanes 23, mean 1.4e-3
    # — budgets sit at ~1.5-2x the measured values (ADVICE r3: record the
    # measurement so a future regression can't hide under a round number).
    assert abs(int(seg.sum()) - ref_seg) <= max(4, n // 300)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    bad_lanes = np.unique(np.argwhere(rel > 0.05)[:, 0])
    assert len(bad_lanes) <= max(4, n // 64)    # near-tangent winner flips
    assert np.abs(got - ref).mean() < 3e-3


def test_sphere_only_chunked_walk():
    """Sphere-only scene with the compacted chunk walk forced.

    Regression: the s_sec SMEM scratch unpack lived inside the
    has_planar block, so any sphere-only scene reaching n_sch > 1
    (>= 1024 spheres, or RTW_S_CHUNK / s_chunk_override) crashed with
    a NameError on slist_ref. The chunk walk only skips work (cull
    flags gate whole 128-wide chunks), so results must match the
    unchunked default up to near-tangent winner flips.
    """
    cfg = RenderConfig(width=32, height=18, samples_per_pixel=4, max_depth=6,
                       seed=3, use_pallas=False)
    objs, cams, bg = jumpy_balls(cfg.aspect_ratio, seed=0)
    scene, static = B.build_scene(objs, background=bg, seed=cfg.seed)
    n = cfg.n_rays
    seed_u = jnp.uint32(cfg.seed)
    base, bseg = render_fused(scene, cfg, cams[0], 0, n, seed_u,
                              interpret=True, static=static)
    got, seg = render_fused(scene, cfg, cams[0], 0, n, seed_u,
                            interpret=True, static=static,
                            s_chunk_override=128)
    assert abs(int(seg.sum()) - int(bseg.sum())) <= max(4, n // 300)
    rel = np.abs(np.asarray(got) - np.asarray(base)) \
        / (np.abs(np.asarray(base)) + 1e-3)
    bad = np.unique(np.argwhere(rel > 0.05)[:, 0])
    assert len(bad) <= max(4, n // 300)
    assert np.abs(np.asarray(got) - np.asarray(base)).mean() < 3e-3


def test_chunked_equals_whole():
    """lane_start/n_chunk slicing must not change any lane's stream."""
    cfg = RenderConfig(width=16, height=9, samples_per_pixel=4, max_depth=4,
                       seed=7, use_pallas=False)
    objs, cams, bg = two_spheres(cfg.aspect_ratio)
    scene, static = B.build_scene(objs, background=bg, seed=cfg.seed)
    n = cfg.n_rays
    seed_u = jnp.uint32(cfg.seed)
    whole, _ = render_fused(scene, cfg, cams[0], 0, n, seed_u, interpret=True)
    half = n // 2
    a, _ = render_fused(scene, cfg, cams[0], 0, half, seed_u, interpret=True)
    b, _ = render_fused(scene, cfg, cams[0], half, n - half, seed_u,
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(whole),
                                  np.concatenate([np.asarray(a), np.asarray(b)]))


def test_cornell_matches_staged_path():
    """Full cornell — walls (rects) + rotated cuboids (triangles) — runs
    fused: the unified planar family covers both."""
    ref, ref_seg, got, seg, n = _compare(cornell_box, {}, width=24, height=24,
                                         spp=4, depth=6, seed=11)
    assert abs(int(seg.sum()) - ref_seg) <= max(4, n // 200)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    bad_lanes = np.unique(np.argwhere(rel > 0.05)[:, 0])
    assert len(bad_lanes) <= max(4, n // 100)
    assert np.abs(got - ref).mean() < 1e-3


def test_simple_triangle_matches_staged_path():
    """UVDebug triangle + checker ground: triangle bound, barycentric UV
    interpolation, and the in-kernel UVDebug texture."""
    from raytracer_weekend_tpu.models.scenes import simple_triangle
    ref, ref_seg, got, seg, n = _compare(simple_triangle, {}, width=24,
                                         height=24, spp=4, depth=6, seed=13)
    assert abs(int(seg.sum()) - ref_seg) <= max(4, n // 200)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    bad_lanes = np.unique(np.argwhere(rel > 0.05)[:, 0])
    assert len(bad_lanes) <= max(4, n // 100)
    assert np.abs(got - ref).mean() < 1e-3


def test_mesh_scene_matches_staged_path():
    """Smooth-shaded mesh triangles (vertex normals interpolated,
    unnormalized — triangular.rs:126) agree with the staged path."""
    from raytracer_weekend_tpu.camera import make_camera
    from raytracer_weekend_tpu.scene.builder import (
        DiffuseLight, Lambertian, Metal, Triangle, XZRectangle)

    def mesh_scene(aspect):
        rng = np.random.default_rng(42)
        objs = [XZRectangle(-6, 6, -6, 6, -1.2, Lambertian((0.6, 0.6, 0.6))),
                XZRectangle(-2, 2, -2, 2, 4.0, DiffuseLight((4, 4, 4)))]
        mats = [Lambertian((0.8, 0.3, 0.3)), Metal((0.9, 0.9, 0.9), 0.05)]
        for i in range(40):  # random smooth-shaded shards
            v = rng.uniform(-2, 2, (3, 3)).astype(np.float32)
            n = rng.normal(size=(3, 3)).astype(np.float32) * 1.5
            objs.append(Triangle(
                tuple(tuple(float(c) for c in x) for x in v), mats[i % 2],
                normals=tuple(tuple(float(c) for c in x) for x in n)))
        cam = make_camera(look_from=(0, 1, -8), look_at=(0, 0, 0),
                          up_vector=(0, 1, 0), vertical_field_of_view=45.0,
                          aspect_ratio=aspect, aperture=0.0,
                          focus_dist=8.0, time0=0.0, time1=1.0)
        return objs, [cam], (0.05, 0.05, 0.08)

    ref, ref_seg, got, seg, n = _compare(mesh_scene, {}, width=24, height=24,
                                         spp=4, depth=5, seed=17)
    assert abs(int(seg.sum()) - ref_seg) <= max(4, n // 200)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    bad_lanes = np.unique(np.argwhere(rel > 0.05)[:, 0])
    assert len(bad_lanes) <= max(4, n // 100)
    assert np.abs(got - ref).mean() < 1e-3


def test_chunked_planar_equals_unchunked():
    """Prim-axis chunking (mesh-scale VMEM bound) must not change winners:
    a 170-triangle scene at r_chunk=128 (2 chunks) vs one 256-chunk,
    bit-identical."""
    from raytracer_weekend_tpu.camera import make_camera
    from raytracer_weekend_tpu.scene.builder import (
        DiffuseLight, Lambertian, Triangle, XZRectangle)

    rng = np.random.default_rng(5)
    objs = [XZRectangle(-6, 6, -6, 6, -1.5, Lambertian((0.6, 0.6, 0.6))),
            XZRectangle(-2, 2, -2, 2, 4.5, DiffuseLight((4, 4, 4)))]
    m = Lambertian((0.7, 0.4, 0.3))
    for _ in range(170):
        v = rng.uniform(-2.5, 2.5, (3, 3))
        objs.append(Triangle(tuple(tuple(float(c) for c in x) for x in v), m))
    cam = make_camera(look_from=(0, 1, -8), look_at=(0, 0, 0),
                      up_vector=(0, 1, 0), vertical_field_of_view=45.0,
                      aspect_ratio=1.0, aperture=0.0, focus_dist=8.0,
                      time0=0.0, time1=1.0)
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=2, max_depth=4,
                       seed=7, use_pallas=False)
    scene, static = B.build_scene(objs, background=(0.1, 0.1, 0.15))
    n = cfg.n_rays
    seed_u = jnp.uint32(cfg.seed)
    whole, sw = render_fused(scene, cfg, cam, 0, n, seed_u,
                             interpret=True, static=static)
    chunked, sc = render_fused(scene, cfg, cam, 0, n, seed_u,
                               interpret=True, static=static,
                               r_chunk_override=128)
    # Near-exact, not bit-exact: in-kernel chunk AABB culling legitimately
    # skips the blend arithmetic for pruned chunks, which can move a
    # tie-adjacent lane by 1 ULP (both paths match the staged oracle).
    np.testing.assert_allclose(np.asarray(whole), np.asarray(chunked),
                               rtol=0.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sw), np.asarray(sc))


def test_smokey_cornell_matches_staged_path():
    """Constant-medium smoke cuboids (rotated box boundaries) + walls: the
    in-kernel volume candidates and isotropic scatter match the staged path
    (including the reference's log10 distance quirk, volumes.rs:58)."""
    from raytracer_weekend_tpu.models.scenes import smokey_cornell_box
    ref, ref_seg, got, seg, n = _compare(smokey_cornell_box, {}, width=24,
                                         height=24, spp=4, depth=6, seed=19)
    assert abs(int(seg.sum()) - ref_seg) <= max(4, n // 200)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    bad_lanes = np.unique(np.argwhere(rel > 0.05)[:, 0])
    assert len(bad_lanes) <= max(4, n // 100)
    assert np.abs(got - ref).mean() < 1e-3


def test_sphere_medium_matches_staged_path():
    """Sphere-boundary medium (book2's subsurface ball) in the megakernel."""
    from raytracer_weekend_tpu.camera import make_camera
    from raytracer_weekend_tpu.scene.builder import (
        ConstantMedium, DiffuseLight, Lambertian, SolidColor, Sphere,
        XZRectangle)

    def medium_scene(aspect):
        objs = [
            XZRectangle(-6, 6, -6, 6, -1.5, Lambertian((0.5, 0.5, 0.5))),
            XZRectangle(-2, 2, -2, 2, 5.0, DiffuseLight((5, 5, 5))),
            ConstantMedium(Sphere((0.0, 0.0, 0.0), 1.2, Lambertian((1, 1, 1))),
                           density=0.6, texture=SolidColor((0.2, 0.4, 0.9))),
            Sphere((2.5, 0.0, 0.5), 0.8, Lambertian((0.8, 0.2, 0.2))),
        ]
        cam = make_camera(look_from=(0, 1, -7), look_at=(0, 0, 0),
                          up_vector=(0, 1, 0), vertical_field_of_view=40.0,
                          aspect_ratio=aspect, aperture=0.0, focus_dist=7.0,
                          time0=0.0, time1=1.0)
        return objs, [cam], (0.02, 0.02, 0.03)

    ref, ref_seg, got, seg, n = _compare(medium_scene, {}, width=24,
                                         height=24, spp=4, depth=6, seed=23)
    assert abs(int(seg.sum()) - ref_seg) <= max(4, n // 200)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    bad_lanes = np.unique(np.argwhere(rel > 0.05)[:, 0])
    assert len(bad_lanes) <= max(4, n // 100)
    assert np.abs(got - ref).mean() < 1e-3


def _rect_room(aspect):
    """Cornell-style walls + light + two spheres: the fused rect workload."""
    from raytracer_weekend_tpu.camera import make_camera
    from raytracer_weekend_tpu.scene.builder import (
        Dielectric, DiffuseLight, Lambertian, Metal, Sphere, XYRectangle,
        XZRectangle, YZRectangle)

    red = Lambertian((0.65, 0.05, 0.05))
    white = Lambertian((0.73, 0.73, 0.73))
    green = Lambertian((0.12, 0.45, 0.15))
    light = DiffuseLight((15.0, 15.0, 15.0))
    objs = [
        YZRectangle(0, 555, 0, 555, 555, green),
        YZRectangle(0, 555, 0, 555, 0, red),
        XZRectangle(213, 343, 227, 332, 554, light),
        XZRectangle(0, 555, 0, 555, 0, white),
        XZRectangle(0, 555, 0, 555, 555, white),
        XYRectangle(0, 555, 0, 555, 555, white),
        Sphere((190, 90, 190), 90, Dielectric(1.5)),
        Sphere((370, 120, 350), 120, Metal((0.8, 0.85, 0.88), fuzz=0.1)),
    ]
    cam = make_camera(look_from=(278, 278, -800), look_at=(278, 278, 0),
                      up_vector=(0, 1, 0), vertical_field_of_view=40.0,
                      aspect_ratio=aspect, aperture=0.0, focus_dist=10.0,
                      time0=0.0, time1=1.0)
    return objs, [cam], (0.0, 0.0, 0.0)


def test_rect_room_matches_staged_path():
    """Sphere+rect fused path vs the staged wavefront (emissive rect room).

    Wall corners/edges are knife edges for the K-split planar planes
    (~1-ulp reassociation vs the staged form): allow ~0.7% segment flips.
    """
    ref, ref_seg, got, seg, n = _compare(_rect_room, {}, width=24, height=24,
                                         spp=4, depth=6, seed=5)
    assert abs(int(seg.sum()) - ref_seg) <= max(4, n // 120)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    bad_lanes = np.unique(np.argwhere(rel > 0.05)[:, 0])
    assert len(bad_lanes) <= max(4, n // 100)
    assert np.abs(got - ref).mean() < 1e-3


def test_rect_only_scene_fused():
    """A scene with no spheres at all compiles the rect-only kernel."""
    from raytracer_weekend_tpu.camera import make_camera
    from raytracer_weekend_tpu.scene.builder import DiffuseLight, Lambertian, \
        XYRectangle, XZRectangle

    objs = [
        XZRectangle(-2, 2, -2, 2, 0, Lambertian((0.5, 0.5, 0.5))),
        XYRectangle(-1, 1, 0, 2, -2, DiffuseLight((4.0, 4.0, 4.0))),
    ]
    cam = make_camera(look_from=(0, 2, 6), look_at=(0, 1, 0),
                      up_vector=(0, 1, 0), vertical_field_of_view=40.0,
                      aspect_ratio=1.0, aperture=0.0, focus_dist=10.0,
                      time0=0.0, time1=1.0)
    scenef = lambda aspect: (objs, [cam], (0.05, 0.05, 0.08))  # noqa: E731
    ref, ref_seg, got, seg, n = _compare(scenef, {}, width=16, height=16,
                                         spp=4, depth=4, seed=2)
    assert abs(int(seg.sum()) - ref_seg) <= max(2, n // 500)
    assert np.abs(got - ref).mean() < 1e-3


def _assert_close(ref, ref_seg, got, seg, n, seg_budget=200, lane_budget=100,
                  mean_budget=5e-3):
    assert abs(int(seg.sum()) - ref_seg) <= max(4, n // seg_budget)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    bad_lanes = np.unique(np.argwhere(rel > 0.05)[:, 0])
    assert len(bad_lanes) <= max(4, n // lane_budget)
    assert np.abs(got - ref).mean() < mean_budget


def test_perlin_scene_matches_staged_path():
    """Noise textures run fused via the deferred-texture mode: the kernel
    shades texels as 1.0, records hit points, and the host folds the exact
    staged-path Perlin marble back in (texture.rs:90-94)."""
    from raytracer_weekend_tpu.models.scenes import two_perlin_spheres
    res = _compare(two_perlin_spheres, {}, width=24, height=16, spp=4,
                   depth=6, seed=3)
    _assert_close(*res)


def test_earth_scene_matches_staged_path():
    """Image texture on a sphere (earthmap nearest fetch): the deferred
    record carries the outward normal; the host derives the spherical UV
    (spherical.rs:62-77) and fetches with image_texture.rs:34-52 parity."""
    from raytracer_weekend_tpu.models.scenes import earth
    res = _compare(earth, {}, width=24, height=16, spp=4, depth=6, seed=3)
    _assert_close(*res)


def test_simple_light_matches_staged_path():
    """Perlin spheres + image-EMISSION light (scenes.rs:292-294): the
    deferred factor product is inclusive at the emitting bounce."""
    from raytracer_weekend_tpu.models.scenes import simple_light
    res = _compare(simple_light, {}, width=24, height=16, spp=4, depth=6,
                   seed=3)
    _assert_close(*res)


def test_book2_final_matches_staged_path():
    """The full book2 workload — 1006 spheres (moving, dielectric, metal),
    2401 rects, 2 constant media, noise + image textures — fused end to end.

    Segment budget is looser than the other scenes: the 400 ground cuboids
    share edges, so near-tangent winner flips between the kernel's
    MXU-factored planes and the staged path are structurally more common
    (~0.5% of segments at this size)."""
    from raytracer_weekend_tpu.models.scenes import book2_final_scene
    res = _compare(book2_final_scene, {"seed": 0}, width=20, height=20,
                   spp=2, depth=6, seed=3)
    # Wider budgets than the other scenes: whole-scene mist volumes make
    # every bounce a volume-vs-surface winner race, so the K-split
    # quadratic's ~1-ulp reassociation vs the staged form flips a few
    # percent of lanes onto different (equally valid) sample paths.
    # Measured r4 (this config): seg_delta 32, bad_lanes 4, mean 1.5e-2
    # — the budgets below are 1.25-2x those measurements, not round-number
    # slack (ADVICE r3).
    _assert_close(*res, seg_budget=20, lane_budget=100, mean_budget=2e-2)


def test_render_image_fused_dispatch(monkeypatch):
    """render_image with use_pallas=True routes through the megakernel on CPU
    (interpret) and matches the staged image."""
    cfg_f = RenderConfig(width=16, height=9, samples_per_pixel=2, max_depth=4,
                         seed=1, use_pallas=True)
    cfg_s = RenderConfig(width=16, height=9, samples_per_pixel=2, max_depth=4,
                         seed=1, use_pallas=False)
    objs, cams, bg = two_spheres(cfg_f.aspect_ratio)
    scene, static = B.build_scene(objs, background=bg, seed=1)
    assert integrator.fused_eligible(static, cfg_f)
    img_f = integrator.render_image(scene, static, cfg_f, cams[0])
    img_s = integrator.render_image(scene, static, cfg_s, cams[0])
    np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_s),
                               rtol=1e-5, atol=1e-5)


def test_deep_phased_render_matches_single_pass():
    """Stream compaction between depth phases (SURVEY §5.7,
    render_fused_deep): per-lane results must be BITWISE identical to the
    single-pass kernel — the counter-based RNG keys on (lane id, absolute
    depth), so batch position cannot affect a lane's path. Covers the
    deferred-texture cross-phase factor chaining (book2: volumes + noise +
    image) and the live-lane gather (min_bucket forces real compaction)."""
    from raytracer_weekend_tpu.models.scenes import generate_scene
    from raytracer_weekend_tpu.ops.pallas import megakernel as MK

    for name, w, h, depth in [("book2_final_scene", 10, 6, 20),
                              ("jumpy_balls", 20, 12, 12)]:
        data, static, cams = generate_scene(name, 16 / 9)
        cfg = RenderConfig(width=w, height=h, samples_per_pixel=1,
                           max_depth=depth)
        rad_d, seg_d = MK.render_fused_deep(
            data, cfg, cams[0], 0, cfg.n_rays, 7, static, phase_len=4,
            interpret=True, min_bucket=8)
        rad_s, seg_s = MK._render_fused_core(
            data, cfg, cams[0], 0, cfg.n_rays, 7, interpret=True,
            static=static)
        np.testing.assert_array_equal(np.asarray(rad_d), np.asarray(rad_s))
        np.testing.assert_array_equal(np.asarray(seg_d), np.asarray(seg_s))
