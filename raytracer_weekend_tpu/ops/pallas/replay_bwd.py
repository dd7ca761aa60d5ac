"""Fused Pallas replay backward: the megakernel VJP in one kernel.

The differentiable fused path (fused_diff.py) pairs the megakernel forward
with a path replay for the backward. Through round 3 that replay was XLA
(B,)-shaped math (replay.py): measured on v5e (jumpy 400x225x16 d8) the
replay forward alone costs 116 ms against a 40 ms fused forward, and the
full fwd+bwd 287 ms — 7.1x the forward, vs the <=3x target (BASELINE.md).
The XLA replay is gather-bound: one (B,) row gather per bounce runs on the
TPU scalar unit at ~10 cycles/index, and the autodiff transpose doubles it.

This kernel fuses the ENTIRE backward into one Pallas call per ray tile,
sharing the megakernel's (8, L) layout and helpers:

  forward sweep  (fori over depth): one-hot row gather from the saved
      winner codes (MXU matmul against the [hi; lo]-split kernel table —
      the megakernel's split-gather trick), per-lane t/normal/texture/
      scatter recompute (VPU), per-bounce state (o, d, tp, alive) and
      gathered rows stored in VMEM scratch.
  reverse sweep  (fori over depth, reversed): hand-derived chain rules
      for the radiance estimator rad = sum_k tp_k * emit_k (+ miss * bg)
      through the sphere quadratic, front-face flip, checker/solid
      texture select, and the Lambertian/Metal/Dielectric scatter
      branches (discrete choices fixed, continuous factors
      differentiated — exactly replay.py's gradient semantics).
      Per-bounce table cotangents accumulate onto the MXU via the
      transposed one-hot (dot over the lane axis, HIGHEST precision);
      the (KT, S) table gradient accumulates across grid steps in a
      revisited output block.

Outputs: d(ktab) (KT, S), d(o0)/d(d0) (B, 3), d(time) (B,), d(bg) (B, 3)
per-lane contributions. The host chains them through jax.vjp of the table
packing and of the primary-ray generation (_pixel_rays), so gradients
reach sphere centers/radii, material fuzz/IOR, texture colors, the
background, and the camera — matching jax.vjp(replay_rays) semantics.

Scope (v1): sphere-only scenes, solid/checker textures, no volumes —
the BASELINE config-1 workload (jumpy/two_spheres). Other scenes fall
back to the XLA replay (fused_diff gates on SceneStatic).

Ref anchors: lib.rs:97-117 (the estimator), material.rs:42-142 (the
scatter branches), spherical.rs:18-77 (the quadratic + UV).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_weekend_tpu import rng as rt_rng
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.ops.pallas.megakernel import (
    _BIG,
    _bf16_trunc,
    _rand4,
    _round_up,
    _unit_vec,
)
from raytracer_weekend_tpu.scene.data import SceneData

# Kernel-table row layout (KT, S). Mirrors replay._pack_spheres' columns.
_K_AX, _K_AY, _K_AZ = 0, 1, 2          # alpha (center at time 0)
_K_BX, _K_BY, _K_BZ = 3, 4, 5          # beta (center velocity)
_K_R, _K_R2 = 6, 7                     # signed radius, radius^2
_K_MTYPE, _K_FUZZ, _K_IOR = 8, 9, 10
_K_TTYPE = 11
_K_C1R, _K_C1G, _K_C1B = 12, 13, 14
_K_C2R, _K_C2G, _K_C2B = 15, 16, 17
_K_TSCALE = 18
KT_ROWS = 24                           # padded to a sublane multiple


def pack_ktab(scene: SceneData) -> Array:
    """(KT, S) differentiable sphere table for the replay-bwd kernel.

    Same coefficient definitions as replay._pack_spheres (alpha/beta
    affine center, signed radius) with the material/texture tail resolved
    to columns; jax.vjp of this function routes the kernel's d(ktab)
    back to the scene pytree leaves."""
    sp = scene.spheres
    mt, tx = scene.materials, scene.textures
    dt = sp.t1 - sp.t0
    beta = (sp.c1 - sp.c0) / jnp.where(dt == 0, 1.0, dt)[:, None]
    alpha = sp.c0 - sp.t0[:, None] * beta
    tid = mt.tex[sp.mat]
    c1c = tx.color1[tid]
    c2c = tx.color2[tid]
    rows = [
        alpha[:, 0], alpha[:, 1], alpha[:, 2],
        beta[:, 0], beta[:, 1], beta[:, 2],
        sp.radius, sp.radius ** 2,
        mt.mtype[sp.mat].astype(jnp.float32),
        mt.fuzz[sp.mat], mt.ior[sp.mat],
        tx.ttype[tid].astype(jnp.float32),
        c1c[:, 0], c1c[:, 1], c1c[:, 2],
        c2c[:, 0], c2c[:, 1], c2c[:, 2],
        tx.scale[tid],
    ]
    tab = jnp.stack(rows, axis=0).astype(jnp.float32)
    return jnp.pad(tab, ((0, KT_ROWS - tab.shape[0]), (0, 0)))


def _kernel(par_ref, ipar_ref, rid_ref, o_ref, d_ref, tm_ref, cod_ref,
            g_ref,
            ktab_ref,
            dtab_ref, do_ref, dd_ref, dtm_ref, dbg_ref,
            st_ref, row_ref,
            *, max_depth: int, t_min: float, tile_b: int, s_pad: int):
    f = jnp.float32
    L = tile_b // 8
    D = max_depth

    def P(i):
        return par_ref[0, i]

    seed = jax.lax.bitcast_convert_type(
        rid_ref[0:8, :] * 0 + ipar_ref[0, 0], jnp.uint32)
    rid = jax.lax.bitcast_convert_type(rid_ref[0:8, :], jnp.uint32)
    lane0 = rid_ref[0:8, :] * 0

    ox0 = o_ref[0:8, :]
    oy0 = o_ref[8:16, :]
    oz0 = o_ref[16:24, :]
    dx0 = d_ref[0:8, :]
    dy0 = d_ref[8:16, :]
    dz0 = d_ref[16:24, :]
    time = tm_ref[0:8, :]
    in_chunk = tm_ref[8:16, :]          # 1.0 live lane / 0.0 padded
    zero_f = time * 0.0
    one_f = zero_f + 1.0
    bg_r, bg_g, bg_b = P(0), P(1), P(2)

    dn_g = (((1,), (0,)), ((), ()))     # contract the S axis (gather)
    dn_t = (((1,), (1,)), ((), ()))     # contract the lane axis (transpose)

    # Mosaic iota must be integer-typed; convert once (loop-invariant).
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s_pad, L), 0).astype(f)

    # ---------------- forward sweep: recompute + stash -------------------
    def fwd_body(k, carry):
        ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, alive_m = carry
        # stash bounce-k start state (10 planes)
        st_ref[pl.ds(k * 80, 8), :] = ox
        st_ref[pl.ds(k * 80 + 8, 8), :] = oy
        st_ref[pl.ds(k * 80 + 16, 8), :] = oz
        st_ref[pl.ds(k * 80 + 24, 8), :] = dx
        st_ref[pl.ds(k * 80 + 32, 8), :] = dy
        st_ref[pl.ds(k * 80 + 40, 8), :] = dz
        st_ref[pl.ds(k * 80 + 48, 8), :] = tpr
        st_ref[pl.ds(k * 80 + 56, 8), :] = tpg
        st_ref[pl.ds(k * 80 + 64, 8), :] = tpb
        st_ref[pl.ds(k * 80 + 72, 8), :] = alive_m

        code = cod_ref[pl.ds(k * 8, 8), :]
        hitf = jnp.where((code > 0.5) & (alive_m > 0.0), one_f, zero_f)
        idx = (code - 1.0) * 0.25       # (code - fam)/4 for fam==1
        idx = jnp.where(hitf > 0.0, idx, zero_f)

        # one-hot gather per sublane row: [hi; lo] blocks reconstruct the
        # row to ~2^-17 at DEFAULT (bf16-pass) cost.
        rows8 = []
        for s in range(8):
            oh = jnp.where(iota_s == idx[s:s + 1, :], f(1.0), f(0.0))
            pr = jax.lax.dot_general(ktab_ref[0:2 * KT_ROWS, :], oh, dn_g,
                                     preferred_element_type=f)
            rows8.append(pr[0:KT_ROWS] + pr[KT_ROWS:2 * KT_ROWS])
            row_ref[pl.ds(k * 8 * KT_ROWS + s * KT_ROWS, KT_ROWS), :] = \
                rows8[s]

        def G(r):
            return jnp.concatenate([rw[r:r + 1, :] for rw in rows8], axis=0)

        # bounce math (replay.py semantics; values only — chain in reverse)
        ax_, ay_, az_ = G(_K_AX), G(_K_AY), G(_K_AZ)
        bx_, by_, bz_ = G(_K_BX), G(_K_BY), G(_K_BZ)
        rr, r2 = G(_K_R), G(_K_R2)
        cx = ax_ + time * bx_
        cy = ay_ + time * by_
        cz = az_ + time * bz_
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        a = dx * dx + dy * dy + dz * dz
        half_b = ocx * dx + ocy * dy + ocz * dz
        c_t = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = half_b * half_b - a * c_t
        sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
        # Padded/dead lanes carry d = 0 (a = 0): a raw 1/a would produce
        # inf, and masked-zero cotangents times inf are NaN — one NaN
        # lane poisons every table column through the one-hot dot.
        inv_a = 1.0 / jnp.maximum(a, f(1e-20))
        root1 = (-half_b - sq) * inv_a
        root2 = (-half_b + sq) * inv_a
        t = jnp.where(root1 >= f(t_min), root1, root2)
        t = jnp.where(hitf > 0.0, t, zero_f)
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        inv_r = 1.0 / jnp.where(rr == 0.0, 1.0, rr)
        nx_o = (px - cx) * inv_r
        ny_o = (py - cy) * inv_r
        nz_o = (pz - cz) * inv_r
        frontf = jnp.where(dx * nx_o + dy * ny_o + dz * nz_o < 0.0,
                           one_f, zero_f)
        sgn = 2.0 * frontf - 1.0
        nx, ny, nz = nx_o * sgn, ny_o * sgn, nz_o * sgn

        scale = G(_K_TSCALE)
        sines = (jnp.sin(scale * px) * jnp.sin(scale * py)
                 * jnp.sin(scale * pz))
        use2 = jnp.where((G(_K_TTYPE) == 1.0) & (sines < 0.0), one_f,
                         zero_f)
        tex_r = use2 * G(_K_C2R) + (1.0 - use2) * G(_K_C1R)
        tex_g = use2 * G(_K_C2G) + (1.0 - use2) * G(_K_C1G)
        tex_b = use2 * G(_K_C2B) + (1.0 - use2) * G(_K_C1B)

        mtype = G(_K_MTYPE)
        depth_u = jax.lax.bitcast_convert_type(lane0 + k, jnp.uint32)

        inv_len = 1.0 / jnp.sqrt(a + f(1e-20))
        ux, uy, uz = dx * inv_len, dy * inv_len, dz * inv_len

        a1, a2, _, _ = _rand4(rid, depth_u, rt_rng.SALT_LAMBERTIAN, seed)
        svx, svy, svz = _unit_vec(a1, a2)
        lamx, lamy, lamz = nx + svx, ny + svy, nz + svz
        nz8 = f(1e-8)
        degen = ((jnp.abs(lamx) < nz8) & (jnp.abs(lamy) < nz8)
                 & (jnp.abs(lamz) < nz8))
        lamx = jnp.where(degen, nx, lamx)
        lamy = jnp.where(degen, ny, lamy)
        lamz = jnp.where(degen, nz, lamz)

        m1_, m2_, m3_, _ = _rand4(rid, depth_u, rt_rng.SALT_METAL, seed)
        bx3, by3, bz3 = _unit_vec(m1_, m2_)
        brad = jnp.exp(jnp.log(jnp.maximum(m3_, f(1e-30))) * f(1.0 / 3.0))
        fuzz = G(_K_FUZZ)
        u_dot_n = ux * nx + uy * ny + uz * nz
        metx = ux - 2.0 * u_dot_n * nx + fuzz * bx3 * brad
        mety = uy - 2.0 * u_dot_n * ny + fuzz * by3 * brad
        metz = uz - 2.0 * u_dot_n * nz + fuzz * bz3 * brad
        met_alive = (metx * nx + mety * ny + metz * nz) > 0.0

        e1, _, _, _ = _rand4(rid, depth_u, rt_rng.SALT_DIELECTRIC, seed)
        ior = G(_K_IOR)
        ratio = jnp.where(frontf > 0.0, 1.0 / jnp.maximum(ior, f(1e-6)),
                          ior)
        cos_t = jnp.minimum(-u_dot_n, 1.0)
        sin_t = jnp.sqrt(jnp.maximum(f(1e-12), 1.0 - cos_t * cos_t))
        cannot = ratio * sin_t > 1.0
        r0 = (1.0 - ratio) / (1.0 + ratio)
        r0 = r0 * r0
        omc = 1.0 - cos_t
        omc2 = omc * omc
        schlick = r0 + (1.0 - r0) * omc2 * omc2 * omc
        choose_reflect = cannot | (schlick > e1)
        rpx = ratio * (ux + cos_t * nx)
        rpy = ratio * (uy + cos_t * ny)
        rpz = ratio * (uz + cos_t * nz)
        rp_sq = rpx * rpx + rpy * rpy + rpz * rpz
        par_m = -jnp.sqrt(jnp.maximum(f(1e-12), jnp.abs(1.0 - rp_sq)))
        refx = rpx + par_m * nx
        refy = rpy + par_m * ny
        refz = rpz + par_m * nz
        diex = jnp.where(choose_reflect, ux - 2.0 * u_dot_n * nx, refx)
        diey = jnp.where(choose_reflect, uy - 2.0 * u_dot_n * ny, refy)
        diez = jnp.where(choose_reflect, uz - 2.0 * u_dot_n * nz, refz)

        is_met = mtype == 1.0
        is_die = mtype == 2.0
        is_light = mtype == 3.0
        ndx = jnp.where(is_met, metx, jnp.where(is_die, diex, lamx))
        ndy = jnp.where(is_met, mety, jnp.where(is_die, diey, lamy))
        ndz = jnp.where(is_met, metz, jnp.where(is_die, diez, lamz))
        att_r = jnp.where(is_die, 1.0, jnp.where(is_light, 0.0, tex_r))
        att_g = jnp.where(is_die, 1.0, jnp.where(is_light, 0.0, tex_g))
        att_b = jnp.where(is_die, 1.0, jnp.where(is_light, 0.0, tex_b))

        sc_alive = (is_met & met_alive) | (~is_met & ~is_light)
        alive2 = hitf * jnp.where(sc_alive, one_f, zero_f)
        ox = jnp.where(alive2 > 0.0, px, ox)
        oy = jnp.where(alive2 > 0.0, py, oy)
        oz = jnp.where(alive2 > 0.0, pz, oz)
        dx = jnp.where(alive2 > 0.0, ndx, dx)
        dy = jnp.where(alive2 > 0.0, ndy, dy)
        dz = jnp.where(alive2 > 0.0, ndz, dz)
        tpr = jnp.where(hitf > 0.0, tpr * att_r, tpr)
        tpg = jnp.where(hitf > 0.0, tpg * att_g, tpg)
        tpb = jnp.where(hitf > 0.0, tpb * att_b, tpb)
        return (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, alive2)

    init = (ox0, oy0, oz0, dx0, dy0, dz0, one_f, one_f, one_f,
            jnp.where(in_chunk > 0.0, one_f, zero_f))
    jax.lax.fori_loop(0, D, fwd_body, init)

    # ---------------- reverse sweep --------------------------------------
    g_r = g_ref[0:8, :]
    g_g = g_ref[8:16, :]
    g_b = g_ref[16:24, :]

    @pl.when(pl.program_id(0) == 0)
    def _init_dtab():
        dtab_ref[:, :] = jnp.zeros(dtab_ref.shape, f)

    dbg_ref[:, :] = jnp.zeros(dbg_ref.shape, f)

    def rev_body(kk, carry):
        k = D - 1 - kk
        (cox, coy, coz, cdx, cdy, cdz, ctr, ctg, ctb, ctime) = carry
        ox = st_ref[pl.ds(k * 80, 8), :]
        oy = st_ref[pl.ds(k * 80 + 8, 8), :]
        oz = st_ref[pl.ds(k * 80 + 16, 8), :]
        dx = st_ref[pl.ds(k * 80 + 24, 8), :]
        dy = st_ref[pl.ds(k * 80 + 32, 8), :]
        dz = st_ref[pl.ds(k * 80 + 40, 8), :]
        tpr = st_ref[pl.ds(k * 80 + 48, 8), :]
        tpg = st_ref[pl.ds(k * 80 + 56, 8), :]
        tpb = st_ref[pl.ds(k * 80 + 64, 8), :]
        alive_m = st_ref[pl.ds(k * 80 + 72, 8), :]

        code = cod_ref[pl.ds(k * 8, 8), :]
        hitf = jnp.where((code > 0.5) & (alive_m > 0.0), one_f, zero_f)
        missf = jnp.where((alive_m > 0.0) & (code <= 0.5), one_f, zero_f)
        idx = jnp.where(hitf > 0.0, (code - 1.0) * 0.25, zero_f)

        rows8 = [row_ref[pl.ds(k * 8 * KT_ROWS + s * KT_ROWS, KT_ROWS), :]
                 for s in range(8)]

        def G(r):
            return jnp.concatenate([rw[r:r + 1, :] for rw in rows8],
                                   axis=0)

        # recompute the bounce's forward intermediates
        ax_, ay_, az_ = G(_K_AX), G(_K_AY), G(_K_AZ)
        bx_, by_, bz_ = G(_K_BX), G(_K_BY), G(_K_BZ)
        rr, r2 = G(_K_R), G(_K_R2)
        cx = ax_ + time * bx_
        cy = ay_ + time * by_
        cz = az_ + time * bz_
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        a = dx * dx + dy * dy + dz * dz
        half_b = ocx * dx + ocy * dy + ocz * dz
        c_t = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = half_b * half_b - a * c_t
        sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
        # Padded/dead lanes carry d = 0 (a = 0): a raw 1/a would produce
        # inf, and masked-zero cotangents times inf are NaN — one NaN
        # lane poisons every table column through the one-hot dot.
        inv_a = 1.0 / jnp.maximum(a, f(1e-20))
        root1 = (-half_b - sq) * inv_a
        root2 = (-half_b + sq) * inv_a
        near = jnp.where(root1 >= f(t_min), one_f, zero_f)
        t = jnp.where(near > 0.0, root1, root2)
        t = jnp.where(hitf > 0.0, t, zero_f)
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        inv_r = 1.0 / jnp.where(rr == 0.0, 1.0, rr)
        nx_o = (px - cx) * inv_r
        ny_o = (py - cy) * inv_r
        nz_o = (pz - cz) * inv_r
        frontf = jnp.where(dx * nx_o + dy * ny_o + dz * nz_o < 0.0,
                           one_f, zero_f)
        sgn = 2.0 * frontf - 1.0
        nx, ny, nz = nx_o * sgn, ny_o * sgn, nz_o * sgn

        scale = G(_K_TSCALE)
        sines = (jnp.sin(scale * px) * jnp.sin(scale * py)
                 * jnp.sin(scale * pz))
        use2 = jnp.where((G(_K_TTYPE) == 1.0) & (sines < 0.0), one_f,
                         zero_f)
        tex_r = use2 * G(_K_C2R) + (1.0 - use2) * G(_K_C1R)
        tex_g = use2 * G(_K_C2G) + (1.0 - use2) * G(_K_C1G)
        tex_b = use2 * G(_K_C2B) + (1.0 - use2) * G(_K_C1B)

        mtype = G(_K_MTYPE)
        is_met = mtype == 1.0
        is_die = mtype == 2.0
        is_lightf = jnp.where(mtype == 3.0, one_f, zero_f)
        is_lamf = jnp.where(~is_met & ~is_die & (is_lightf == 0.0),
                            one_f, zero_f)

        depth_u = jax.lax.bitcast_convert_type(lane0 + k, jnp.uint32)
        inv_len = 1.0 / jnp.sqrt(a + f(1e-20))
        ux, uy, uz = dx * inv_len, dy * inv_len, dz * inv_len
        u_dot_n = ux * nx + uy * ny + uz * nz

        a1, a2, _, _ = _rand4(rid, depth_u, rt_rng.SALT_LAMBERTIAN, seed)
        svx, svy, svz = _unit_vec(a1, a2)
        lamx, lamy, lamz = nx + svx, ny + svy, nz + svz
        nz8 = f(1e-8)
        degen = ((jnp.abs(lamx) < nz8) & (jnp.abs(lamy) < nz8)
                 & (jnp.abs(lamz) < nz8))

        m1_, m2_, m3_, _ = _rand4(rid, depth_u, rt_rng.SALT_METAL, seed)
        bx3, by3, bz3 = _unit_vec(m1_, m2_)
        brad = jnp.exp(jnp.log(jnp.maximum(m3_, f(1e-30))) * f(1.0 / 3.0))
        fuzz = G(_K_FUZZ)
        metx = ux - 2.0 * u_dot_n * nx + fuzz * bx3 * brad
        mety = uy - 2.0 * u_dot_n * ny + fuzz * by3 * brad
        metz = uz - 2.0 * u_dot_n * nz + fuzz * bz3 * brad
        met_alive = (metx * nx + mety * ny + metz * nz) > 0.0

        e1, _, _, _ = _rand4(rid, depth_u, rt_rng.SALT_DIELECTRIC, seed)
        ior = G(_K_IOR)
        ior_s = jnp.maximum(ior, f(1e-6))
        ratio = jnp.where(frontf > 0.0, 1.0 / ior_s, ior)
        cos_t = jnp.minimum(-u_dot_n, 1.0)
        cos_clip = jnp.where(-u_dot_n < 1.0, one_f, zero_f)
        sin_sq = 1.0 - cos_t * cos_t
        sin_t = jnp.sqrt(jnp.maximum(f(1e-12), sin_sq))
        cannot = ratio * sin_t > 1.0
        r0b = (1.0 - ratio) / (1.0 + ratio)
        r0 = r0b * r0b
        omc = 1.0 - cos_t
        omc2 = omc * omc
        schlick = r0 + (1.0 - r0) * omc2 * omc2 * omc
        choose_reflect = cannot | (schlick > e1)
        reflf = jnp.where(choose_reflect, one_f, zero_f)
        rpx = ratio * (ux + cos_t * nx)
        rpy = ratio * (uy + cos_t * ny)
        rpz = ratio * (uz + cos_t * nz)
        rp_sq = rpx * rpx + rpy * rpy + rpz * rpz
        qv = 1.0 - rp_sq
        mv = jnp.maximum(f(1e-12), jnp.abs(qv))
        sqm = jnp.sqrt(mv)
        par_m = -sqm

        sc_alive = (is_met & met_alive) | (~is_met & (is_lightf == 0.0))
        alive2 = hitf * jnp.where(sc_alive, one_f, zero_f)

        # ---- chain rules (reverse of fwd_body) --------------------------
        # tp' = hit ? tp*att : tp ;  o'/d' = alive2 ? (p, nd) : (o, d)
        # rad += miss ? tp*bg : 0 ;  rad += hit&light ? tp*tex : 0
        att_r = jnp.where(is_die, 1.0,
                          jnp.where(is_lightf > 0.0, 0.0, tex_r))
        att_g = jnp.where(is_die, 1.0,
                          jnp.where(is_lightf > 0.0, 0.0, tex_g))
        att_b = jnp.where(is_die, 1.0,
                          jnp.where(is_lightf > 0.0, 0.0, tex_b))

        # cotangent of p / nd from o'/d' passthrough select
        cpx = alive2 * cox
        cpy = alive2 * coy
        cpz = alive2 * coz
        cox = (1.0 - alive2) * cox
        coy = (1.0 - alive2) * coy
        coz = (1.0 - alive2) * coz
        cndx = alive2 * cdx
        cndy = alive2 * cdy
        cndz = alive2 * cdz
        cdx = (1.0 - alive2) * cdx
        cdy = (1.0 - alive2) * cdy
        cdz = (1.0 - alive2) * cdz

        # radiance contributions at this bounce
        lightf = hitf * is_lightf
        ctex_r = lightf * g_r * tpr
        ctex_g = lightf * g_g * tpg
        ctex_b = lightf * g_b * tpb
        ctp_add_r = lightf * g_r * tex_r + missf * g_r * bg_r
        ctp_add_g = lightf * g_g * tex_g + missf * g_g * bg_g
        ctp_add_b = lightf * g_b * tex_b + missf * g_b * bg_b
        # d(bg) per-lane contributions (summed on the host)
        dbg_ref[pl.ds(0, 8), :] = (dbg_ref[pl.ds(0, 8), :]
                                   + missf * g_r * tpr)
        dbg_ref[pl.ds(8, 8), :] = (dbg_ref[pl.ds(8, 8), :]
                                   + missf * g_g * tpg)
        dbg_ref[pl.ds(16, 8), :] = (dbg_ref[pl.ds(16, 8), :]
                                    + missf * g_b * tpb)

        # tp chain: tp_out = hit ? tp*att : tp
        catt_r = hitf * ctr * tpr
        catt_g = hitf * ctg * tpg
        catt_b = hitf * ctb * tpb
        ctr = jnp.where(hitf > 0.0, ctr * att_r, ctr) + ctp_add_r
        ctg = jnp.where(hitf > 0.0, ctg * att_g, ctg) + ctp_add_g
        ctb = jnp.where(hitf > 0.0, ctb * att_b, ctb) + ctp_add_b

        # att -> tex for every material except dielectric (att = 1) and
        # light (att = 0): lambertian AND metal attenuate by the texture
        # (material.rs:52,86).
        att_tex = ((1.0 - jnp.where(is_die, one_f, zero_f))
                   * (1.0 - is_lightf))
        ctex_r = ctex_r + att_tex * catt_r
        ctex_g = ctex_g + att_tex * catt_g
        ctex_b = ctex_b + att_tex * catt_b

        # tex select -> c1/c2 rows
        dc1_r = (1.0 - use2) * ctex_r
        dc1_g = (1.0 - use2) * ctex_g
        dc1_b = (1.0 - use2) * ctex_b
        dc2_r = use2 * ctex_r
        dc2_g = use2 * ctex_g
        dc2_b = use2 * ctex_b

        # nd select -> branch cotangents
        metf = jnp.where(is_met, one_f, zero_f)
        dief = jnp.where(is_die, one_f, zero_f)
        cmx = metf * cndx
        cmy = metf * cndy
        cmz = metf * cndz
        cdiex = dief * cndx
        cdiey = dief * cndy
        cdiez = dief * cndz
        clamx = is_lamf * cndx
        clamy = is_lamf * cndy
        clamz = is_lamf * cndz

        cnx = zero_f
        cny = zero_f
        cnz = zero_f
        cux = zero_f
        cuy = zero_f
        cuz = zero_f
        cfuzz = zero_f
        cior = zero_f

        # lambertian: lam = degen ? n : n + sv  -> cn += clam either way
        del degen  # lam = n + sv or n; both route to n
        cnx = cnx + clamx
        cny = cny + clamy
        cnz = cnz + clamz

        # metal: met = u - 2(u.n)n + fuzz*brad*b
        mdot = nx * cmx + ny * cmy + nz * cmz
        cux = cux + cmx - 2.0 * nx * mdot
        cuy = cuy + cmy - 2.0 * ny * mdot
        cuz = cuz + cmz - 2.0 * nz * mdot
        cnx = cnx - 2.0 * (ux * mdot + u_dot_n * cmx)
        cny = cny - 2.0 * (uy * mdot + u_dot_n * cmy)
        cnz = cnz - 2.0 * (uz * mdot + u_dot_n * cmz)
        cfuzz = cfuzz + brad * (bx3 * cmx + by3 * cmy + bz3 * cmz)

        # dielectric
        #   reflect branch: refl = u - 2(u.n)n
        crx = reflf * cdiex
        cry = reflf * cdiey
        crz = reflf * cdiez
        rdot = nx * crx + ny * cry + nz * crz
        cux = cux + crx - 2.0 * nx * rdot
        cuy = cuy + cry - 2.0 * ny * rdot
        cuz = cuz + crz - 2.0 * nz * rdot
        cnx = cnx - 2.0 * (ux * rdot + u_dot_n * crx)
        cny = cny - 2.0 * (uy * rdot + u_dot_n * cry)
        cnz = cnz - 2.0 * (uz * rdot + u_dot_n * crz)
        #   refract branch: refr = rp + par_m*n, rp = ratio(u + cos*n)
        refrf = (1.0 - reflf)
        cfx = refrf * cdiex
        cfy = refrf * cdiey
        cfz = refrf * cdiez
        ndotcf = nx * cfx + ny * cfy + nz * cfz
        # d(par_m)/d(rp) = sign(q) * rp / sqm   (0 where |q| <= 1e-12)
        live_m = jnp.where(jnp.abs(qv) > f(1e-12),
                           jnp.where(qv >= 0.0, one_f, -one_f) / sqm,
                           zero_f)
        crpx = cfx + ndotcf * live_m * rpx
        crpy = cfy + ndotcf * live_m * rpy
        crpz = cfz + ndotcf * live_m * rpz
        cnx = cnx + par_m * cfx
        cny = cny + par_m * cfy
        cnz = cnz + par_m * cfz
        #   rp = ratio*(u + cos*n)
        cux = cux + ratio * crpx
        cuy = cuy + ratio * crpy
        cuz = cuz + ratio * crpz
        ccos = ratio * (nx * crpx + ny * crpy + nz * crpz)
        cnx = cnx + ratio * cos_t * crpx
        cny = cny + ratio * cos_t * crpy
        cnz = cnz + ratio * cos_t * crpz
        cratio = ((ux + cos_t * nx) * crpx + (uy + cos_t * ny) * crpy
                  + (uz + cos_t * nz) * crpz)
        #   cos = min(-u.n, 1)
        cux = cux - nx * ccos * cos_clip
        cuy = cuy - ny * ccos * cos_clip
        cuz = cuz - nz * ccos * cos_clip
        cnx = cnx - ux * ccos * cos_clip
        cny = cny - uy * ccos * cos_clip
        cnz = cnz - uz * ccos * cos_clip
        #   ratio -> ior
        cior = cior + jnp.where(frontf > 0.0,
                                -cratio / (ior_s * ior_s), cratio)

        # u = d * inv_len -> d
        udotcu = ux * cux + uy * cuy + uz * cuz
        cdx = cdx + inv_len * (cux - ux * udotcu)
        cdy = cdy + inv_len * (cuy - uy * udotcu)
        cdz = cdz + inv_len * (cuz - uz * udotcu)

        # n = sgn * outward ; outward = (p - c)/r
        co_x = sgn * cnx
        co_y = sgn * cny
        co_z = sgn * cnz
        cpx = cpx + co_x * inv_r
        cpy = cpy + co_y * inv_r
        cpz = cpz + co_z * inv_r
        ccx = -co_x * inv_r
        ccy = -co_y * inv_r
        ccz = -co_z * inv_r
        c_r = -(nx_o * co_x + ny_o * co_y + nz_o * co_z) * inv_r

        # p = o + t*d
        ct = dx * cpx + dy * cpy + dz * cpz
        cox = cox + cpx
        coy = coy + cpy
        coz = coz + cpz
        cdx = cdx + t * cpx
        cdy = cdy + t * cpy
        cdz = cdz + t * cpz

        # t = (-half_b -+ sq)/a (selected root); dead lanes: t = 0 const
        ct = ct * hitf
        s_r = 2.0 * (1.0 - near) - 1.0      # -1 near root, +1 far root
        csq = ct * s_r * inv_a
        chb = -ct * inv_a
        ca = -ct * t * inv_a
        okd = jnp.where(disc > 0.0, one_f, zero_f)
        cdisc = okd * csq / (2.0 * sq)
        chb = chb + 2.0 * half_b * cdisc
        ca = ca - c_t * cdisc
        cct = -a * cdisc
        # half_b = oc.d ; c = oc.oc - r2 ; a = d.d
        cocx = chb * dx + 2.0 * cct * ocx
        cocy = chb * dy + 2.0 * cct * ocy
        cocz = chb * dz + 2.0 * cct * ocz
        cdx = cdx + chb * ocx + 2.0 * ca * dx
        cdy = cdy + chb * ocy + 2.0 * ca * dy
        cdz = cdz + chb * ocz + 2.0 * ca * dz
        cr2 = -cct
        # a also feeds inv_len (u = d/sqrt(a+eps)) — handled via u chain.
        # oc = o - c
        cox = cox + cocx
        coy = coy + cocy
        coz = coz + cocz
        ccx = ccx - cocx
        ccy = ccy - cocy
        ccz = ccz - cocz
        # c = alpha + time*beta
        ctime = ctime + bx_ * ccx + by_ * ccy + bz_ * ccz

        # r chain: inv_r used in outward; r2 separate row
        # (c_r already w.r.t. rr through inv_r sign handling above)

        # ---- assemble per-lane row cotangents and accumulate ------------
        hit_m = hitf
        crows = [ccx * hit_m, ccy * hit_m, ccz * hit_m,           # alpha
                 time * ccx * hit_m, time * ccy * hit_m,
                 time * ccz * hit_m,                               # beta
                 c_r * hit_m, cr2 * hit_m,                         # r, r2
                 zero_f,                                           # mtype
                 cfuzz * hit_m, cior * hit_m,                      # fuzz,ior
                 zero_f,                                           # ttype
                 dc1_r, dc1_g, dc1_b,
                 dc2_r, dc2_g, dc2_b,
                 zero_f,                                           # scale
                 zero_f, zero_f, zero_f, zero_f, zero_f]           # pad
        for s in range(8):
            cot = jnp.concatenate(
                [cr[s:s + 1, :] for cr in crows], axis=0)          # (KT, L)
            oh = jnp.where(iota_s == idx[s:s + 1, :], f(1.0), f(0.0))
            dtab_ref[:, :] = dtab_ref[:, :] + jax.lax.dot_general(
                cot, oh, dn_t, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=f)                          # (KT, S)

        return (cox, coy, coz, cdx, cdy, cdz, ctr, ctg, ctb, ctime)

    rev0 = (zero_f,) * 6 + (zero_f, zero_f, zero_f, zero_f)
    (cox, coy, coz, cdx, cdy, cdz, _, _, _, ctime) = jax.lax.fori_loop(
        0, D, rev_body, rev0)

    do_ref[0:8, :] = cox
    do_ref[8:16, :] = coy
    do_ref[16:24, :] = coz
    dd_ref[0:8, :] = cdx
    dd_ref[8:16, :] = cdy
    dd_ref[16:24, :] = cdz
    dtm_ref[0:8, :] = ctime



@functools.partial(jax.jit, static_argnames=("cfg", "n_chunk", "interpret"))
def replay_bwd_sphere(ktab: Array, background: Array, cfg: RenderConfig,
                      o: Array, d: Array, time: Array, ray_id: Array,
                      seed, codes: Array, g: Array, n_chunk: int,
                      interpret: bool = False):
    """Run the fused replay backward. Returns (dktab (KT, S), d_o (B, 3),
    d_d (B, 3), d_time (B,), d_bg (3,))."""
    S = ktab.shape[1]
    s_pad = _round_up(max(S, 128), 128)
    ktab = jnp.pad(ktab, ((0, 0), (0, s_pad - S)))
    hi = _bf16_trunc(ktab)
    ktab_split = jnp.concatenate([hi, ktab - hi], axis=0)  # (2KT, s_pad)

    tile_b = 2048
    b_pad = _round_up(max(n_chunk, tile_b), tile_b)
    n_tiles = b_pad // tile_b
    lanes_l = tile_b // 8
    D = cfg.max_depth

    def _wide(x, pad_val=0.0):
        x = jnp.pad(x, ((0, b_pad - x.shape[0]),),
                    constant_values=pad_val)
        return x.reshape(n_tiles, 8, lanes_l).transpose(1, 0, 2).reshape(
            8, n_tiles * lanes_l)

    def _wide3(x):
        return jnp.concatenate([_wide(x[:, i]) for i in range(3)], axis=0)

    o_p = _wide3(o)
    d_p = _wide3(d)
    live = jnp.ones((n_chunk,), jnp.float32)
    tm_p = jnp.concatenate([_wide(time), _wide(live)], axis=0)  # (16, .)
    rid_p = _wide(ray_id.astype(jnp.int32))
    g_p = _wide3(g)
    cod_p = jnp.concatenate([_wide(codes[:, k]) for k in range(D)], axis=0)

    par = jnp.concatenate([
        jnp.asarray(background, jnp.float32).reshape(3),
        jnp.zeros((5,), jnp.float32),
    ]).reshape(1, 8)
    ipar = jnp.asarray(seed, jnp.uint32).astype(jnp.int32).reshape(1, 1)

    kernel = functools.partial(_kernel, max_depth=D, t_min=cfg.t_min,
                               tile_b=tile_b, s_pad=s_pad)
    grid = (n_tiles,)
    out_shapes = [
        jax.ShapeDtypeStruct((KT_ROWS, s_pad), jnp.float32),       # dtab
        jax.ShapeDtypeStruct((24, n_tiles * lanes_l), jnp.float32),  # do
        jax.ShapeDtypeStruct((24, n_tiles * lanes_l), jnp.float32),  # dd
        jax.ShapeDtypeStruct((8, n_tiles * lanes_l), jnp.float32),   # dtm
        jax.ShapeDtypeStruct((24, n_tiles * lanes_l), jnp.float32),  # dbg
    ]
    out_specs = [
        pl.BlockSpec((KT_ROWS, s_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((24, lanes_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((24, lanes_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, lanes_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((24, lanes_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    dtab, do_, dd_, dtm_, dbg_ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, lanes_l), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24, lanes_l), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24, lanes_l), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, lanes_l), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * D, lanes_l), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24, lanes_l), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * KT_ROWS, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((80 * D, lanes_l), jnp.float32),            # states
            pltpu.VMEM((8 * KT_ROWS * D, lanes_l), jnp.float32),   # rows
        ],
        interpret=interpret,
    )(par, ipar, rid_p, o_p, d_p, tm_p, cod_p, g_p, ktab_split)

    def _unlane(x, ch):
        x = x.reshape(ch, 8, n_tiles, lanes_l)
        return x.transpose(2, 1, 3, 0).reshape(b_pad, ch)[:n_chunk]

    d_o = _unlane(do_, 3)
    d_d = _unlane(dd_, 3)
    d_tm = _unlane(dtm_, 1)[:, 0]
    d_bg = _unlane(dbg_, 3).sum(axis=0)
    return dtab[:, :S], d_o, d_d, d_tm, d_bg
