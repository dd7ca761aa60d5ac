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


@functools.lru_cache(maxsize=64)
def _make_diff(static: SceneStatic, cfg: RenderConfig, n_chunk: int,
               interpret: bool):
    from raytracer_weekend_tpu.ops.pallas.megakernel import render_fused

    @jax.custom_vjp
    def fused(scene, cam, lane_start, seed):
        rad, _ = render_fused(scene, cfg, cam, lane_start, n_chunk, seed,
                              interpret=interpret, static=static)
        return rad

    has_sph = static.n_spheres > 0
    has_pla = static.n_rects + static.n_triangles > 0
    kernel_bwd = ((has_sph or has_pla)
                  and static.n_volumes == 0
                  and not static.has_uvdebug)
    defer = kernel_bwd and (static.has_noise or static.has_image)

    def fwd(scene, cam, lane_start, seed):
        outs = render_fused(scene, cfg, cam, lane_start, n_chunk,
                            seed, interpret=interpret, static=static,
                            emit_paths=True, emit_deferred=defer)
        if defer:
            rad, _, codes, ctb, dfr = outs
        else:
            rad, _, codes = outs
            ctb = dfr = None
        return rad, (scene, cam, lane_start, seed, codes, ctb, dfr)

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
        scene, cam, lane_start, seed, codes, ctb, dfr = res
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
                    _combine_deferred)

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
                    return _combine_deferred(
                        sc, ctb_, dfr2, has_noise=static.has_noise,
                        has_image=static.has_image, pallas_noise=False,
                        remat=True)

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
                _float0_like(lane_start), _float0_like(seed))

    fused.defvjp(fwd, bwd)
    return fused


def render_fused_diff(scene: SceneData, static: SceneStatic,
                      cfg: RenderConfig, cam: Camera, lane_start,
                      n_chunk: int, seed,
                      interpret: bool = False) -> Array:
    """Per-lane radiance (n_chunk, 3) with gradients w.r.t. scene + camera."""
    fn = _make_diff(static, cfg, int(n_chunk), bool(interpret))
    return fn(scene, cam, jnp.asarray(lane_start, jnp.int32),
              jnp.asarray(seed, jnp.uint32))
