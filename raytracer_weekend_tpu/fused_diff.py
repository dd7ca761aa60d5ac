"""Differentiable fused rendering: megakernel forward, replay backward.

The fused megakernel (ops.pallas.megakernel) is a Pallas kernel with no
autodiff rule, and the staged wavefront it replaces is ~30x slower — so the
headline differentiable-render path pairs them asymmetrically:

  forward   — the fused kernel, additionally emitting per-bounce winner
              codes (fam + 4*idx, one f32 plane per depth): the complete
              discrete structure of every path.
  backward  — integrator.replay_rays: re-trace the SAVED paths with the
              staged path's own differentiable code, winner lookups replacing
              the O(S) closest-hit search. jax.vjp of the replay is the
              kernel's VJP.

This matches the staged gradient semantics exactly: discrete choices
(winners, hit/miss, reflect/refract branches) are held fixed while the
continuous factors — intersection t, normals, textures (incl. Perlin and
image texels), scatter math — differentiate. Gradients flow to sphere
centers/radii, triangle vertices, material fuzz/IOR, texture colors and
texels, and the camera. Cost: the O(S·B·depth) search runs once (fused);
the backward is O(B·depth) plus its transpose.

Ref anchors: lib.rs:97-117 (the estimator being differentiated),
BASELINE.md fwd+bwd target.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
from jax import Array

from raytracer_weekend_tpu.camera import Camera
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.integrator import _pixel_rays, replay_rays
from raytracer_weekend_tpu.scene.data import SceneData, SceneStatic


def _float0_like(x):
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def prepare_peel(scene: SceneData, static: SceneStatic, cfg: RenderConfig,
                 cam: Camera, n_chunk: int):
    """Precompute the peeled-primary tables for render_fused_diff.

    The peel prepass runs on CONCRETE arrays (megakernel._peel_primary_
    tables); under jit/grad the scene is a tracer and render_fused falls
    back to the unpeeled core — so callers that jit their train step
    (bench.py, train loops) compute the pack once at the top level and
    pass it through as arrays. Returns (static_kwargs, names, arrays) or
    None; forward-only — gradients never flow through the pack (the
    tables are gathered copies of scene rows; the custom VJP computes
    scene gradients from the winner codes independently)."""
    if (not isinstance(n_chunk, int) or n_chunk != cfg.n_rays
            or isinstance(scene.spheres.c0, jax.core.Tracer)
            or isinstance(cam.origin, jax.core.Tracer)):
        return None
    from raytracer_weekend_tpu.ops.pallas.megakernel import (
        _peel_primary_tables)
    peel = _peel_primary_tables(scene, static, cfg, cam, n_chunk, None,
                                bool(static.has_noise or static.has_image),
                                True)
    if not peel:
        return None
    statics = {k: v for k, v in peel.items()
               if not hasattr(v, "dtype")}
    arrays = {k: v for k, v in peel.items() if hasattr(v, "dtype")}
    names = tuple(sorted(arrays))
    return (tuple(sorted(statics.items())), names,
            tuple(arrays[k] for k in names))


@functools.lru_cache(maxsize=64)
def _make_diff(static: SceneStatic, cfg: RenderConfig, n_chunk: int,
               interpret: bool, peel_statics=(), peel_names=()):
    from raytracer_weekend_tpu.ops.pallas.megakernel import render_fused

    def _peel_kw(peel_arrays):
        kw = dict(peel_statics)
        kw.update(zip(peel_names, peel_arrays))
        return kw

    @jax.custom_vjp
    def fused(scene, cam, lane_start, seed, peel_arrays):
        rad, _ = render_fused(scene, cfg, cam, lane_start, n_chunk, seed,
                              interpret=interpret, static=static,
                              **_peel_kw(peel_arrays))
        return rad

    has_sph = static.n_spheres > 0
    has_pla = static.n_rects + static.n_triangles > 0
    kernel_bwd = ((has_sph or has_pla)
                  and static.n_volumes == 0
                  and not static.has_uvdebug)
    defer = kernel_bwd and (static.has_noise or static.has_image)

    def fwd(scene, cam, lane_start, seed, peel_arrays):
        outs = render_fused(scene, cfg, cam, lane_start, n_chunk,
                            seed, interpret=interpret, static=static,
                            emit_paths=True, emit_deferred=defer,
                            **_peel_kw(peel_arrays))
        if defer:
            rad, _, codes, ctb, dfr = outs
        else:
            rad, _, codes = outs
            ctb = dfr = None
        return rad, (scene, cam, lane_start, seed, codes, ctb, dfr,
                     peel_arrays)

    # The fused Pallas replay-backward kernel covers sphere + rect +
    # triangle scenes (ops/pallas/replay_bwd.py). Solid/checker textures
    # evaluate in-kernel; noise/image textures go through the deferred-
    # record factorization: the kernel's per-bounce contributions ctb and
    # texel records dfr are saved at forward time, jax.vjp of the
    # deferred combine yields the texture-table gradients plus the
    # kernel's per-bounce radiance cotangents (c_ctb) and noise
    # hit-point cotangents (c_abc), and the kernel chains the rest.
    # Volume / UVDebug scenes re-trace through the XLA replay
    # (replay.py). Measured v5e (jumpy): XLA replay fwd+bwd 287 ms vs a
    # 40 ms fused forward.

    def bwd(res, g):
        scene, cam, lane_start, seed, codes, ctb, dfr, peel_arrays = res
        # jax.vjp rejects integer inputs: differentiate w.r.t. the float
        # leaves only; int/bool leaves (ids, valid masks) get float0.
        leaves, treedef = jtu.tree_flatten(scene)
        mask = [jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
                for l in leaves]
        float_leaves = [l for l, m in zip(leaves, mask) if m]

        def _unflatten(float_leaves):
            it = iter(float_leaves)
            full = [next(it) if m else l for l, m in zip(leaves, mask)]
            return jtu.tree_unflatten(treedef, full)

        if kernel_bwd:
            from raytracer_weekend_tpu.ops.pallas.replay_bwd import (
                pack_ktab, pack_ptab, replay_bwd_fused)

            def pack_f(float_leaves, cam):
                sc = _unflatten(float_leaves)
                ids = lane_start + jnp.arange(n_chunk, dtype=jnp.int32)
                o, d, time, ray_id = _pixel_rays(cam, cfg, ids, seed)
                ktab = pack_ktab(sc) if has_sph else None
                ptab = pack_ptab(sc, static) if has_pla else None
                return (ktab, ptab, sc.background, o, d, time), ray_id

            g_k = g
            cabc = None
            g_float_c = None
            if defer:
                from raytracer_weekend_tpu.ops.pallas.megakernel import (
                    _combine_deferred, _combine_deferred_single)

                # Dead records (code 0) carry whatever the kernel's lanes
                # held — on-chip that can be huge values whose texture
                # Jacobian is NaN (sin'/asin' of 1e30); the masked-zero
                # cotangent times a NaN Jacobian is NaN and one lane
                # poisons every geometry row through the kernel carries.
                # Differentiate the combine at abc = (0.5, 0.5, 0.5) for
                # dead records: regular for every consumer (sphere_uv's
                # atan2/asin Jacobian is NaN at 0 and at the poles).
                live_rec = (jnp.abs(jnp.round(dfr[..., 3])) > 0.5)[..., None]
                abc_live = jnp.where(live_rec, dfr[..., 0:3], 0.5)

                def combine_f(fl, ctb_, abc):
                    sc = _unflatten(fl)
                    dfr2 = jnp.concatenate([abc, dfr[..., 3:4]], axis=-1)
                    if static.defer_single_hit:
                        return _combine_deferred_single(sc, ctb_, dfr2)
                    # pallas_noise: the turbulence custom-VJP kernel pair
                    # (interpret mode keeps the jnp path — XLA autodiff).
                    return _combine_deferred(
                        sc, ctb_, dfr2, has_noise=static.has_noise,
                        has_image=static.has_image,
                        pallas_noise=not interpret, remat=True)

                _, vjp_c = jax.vjp(combine_f, float_leaves, ctb,
                                   abc_live)
                g_float_c, g_k, cabc = vjp_c(g)
                if not static.has_noise:
                    cabc = None     # image-nearest: d(abc) structurally 0

            (ktab, ptab, bg, o, d, time), ray_id = pack_f(float_leaves, cam)
            dktab, dptab, d_o, d_d, d_tm, d_bg = replay_bwd_fused(
                ktab, ptab, bg, cfg, o, d, time, ray_id, seed, codes, g_k,
                n_chunk, interpret=interpret, cabc=cabc)
            _, vjp = jax.vjp(lambda fl, cm: pack_f(fl, cm)[0],
                             float_leaves, cam)
            g_float, g_cam = vjp((dktab, dptab, d_bg, d_o, d_d, d_tm))
            if g_float_c is not None:
                g_float = [a + b for a, b in zip(g_float, g_float_c)]
        else:
            def replay_f(float_leaves, cam):
                sc = _unflatten(float_leaves)
                ids = lane_start + jnp.arange(n_chunk, dtype=jnp.int32)
                o, d, time, ray_id = _pixel_rays(cam, cfg, ids, seed)
                return replay_rays(sc, static, cfg, o, d, time, ray_id,
                                   seed, codes)

            _, vjp = jax.vjp(replay_f, float_leaves, cam)
            g_float, g_cam = vjp(g)
        it = iter(g_float)
        g_leaves = [next(it) if m else _float0_like(l)
                    for l, m in zip(leaves, mask)]
        return (jtu.tree_unflatten(treedef, g_leaves), g_cam,
                _float0_like(lane_start), _float0_like(seed),
                tuple(jnp.zeros_like(a) for a in peel_arrays))

    fused.defvjp(fwd, bwd)
    return fused


def render_fused_diff(scene: SceneData, static: SceneStatic,
                      cfg: RenderConfig, cam: Camera, lane_start,
                      n_chunk: int, seed,
                      interpret: bool = False, peel=None) -> Array:
    """Per-lane radiance (n_chunk, 3) with gradients w.r.t. scene + camera.

    `peel`: optional prepare_peel(...) pack — engages the peeled-primary
    fast path for the forward inside jit/grad (where the scene is traced
    and render_fused's own concrete-only prepass cannot run). When called
    with concrete args and no pack, one is computed automatically."""
    if peel is None:
        peel = prepare_peel(scene, static, cfg, cam, int(n_chunk))
    peel_statics, peel_names, peel_arrays = peel if peel else ((), (), ())
    fn = _make_diff(static, cfg, int(n_chunk), bool(interpret),
                    peel_statics, peel_names)
    return fn(scene, cam, jnp.asarray(lane_start, jnp.int32),
              jnp.asarray(seed, jnp.uint32), tuple(peel_arrays))
