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
      through the sphere quadratic, the planar (rect/triangle) affine
      intersection + normal interpolation, the front-face flip,
      checker/solid texture select, and the Lambertian/Metal/Dielectric
      scatter branches (discrete choices fixed, continuous factors
      differentiated — exactly replay.py's gradient semantics).
      Per-bounce table cotangents accumulate onto the MXU via the
      transposed one-hot (dot over the lane axis, HIGHEST precision);
      the per-family (rows, prims) table gradients accumulate across
      grid steps in revisited output blocks.

Outputs: d(ktab) (KT, S) / d(ptab) (KP, R) for the families present,
d(o0)/d(d0) (B, 3), d(time) (B,), d(bg) (B, 3) per-lane contributions.
The host chains them through jax.vjp of the table packings and of the
primary-ray generation (_pixel_rays), so gradients reach sphere centers/
radii, rect extents, triangle vertices and shading normals, material
fuzz/IOR, texture colors, the background, and the camera — matching
jax.vjp(replay_rays) semantics.

Scope (v2, round 5): any mix of spheres + rects + triangles with
solid/checker textures — BASELINE configs 1 (jumpy) and 3 (cornell).
Volumes, noise/image textures, and UVDebug fall back to the XLA replay
(fused_diff gates on SceneStatic).

Ref anchors: lib.rs:97-117 (the estimator), material.rs:42-142 (the
scatter branches), spherical.rs:18-77 (sphere quadratic + UV),
rectangular.rs:27-167 + triangular.rs:97-138 (the planar family).
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
from raytracer_weekend_tpu.scene.data import SceneData, SceneStatic
from raytracer_weekend_tpu.vecmath import cross

# Sphere kernel-table row layout (KT, S). Mirrors replay._pack_spheres.
_K_AX, _K_AY, _K_AZ = 0, 1, 2          # alpha (center at time 0)
_K_BX, _K_BY, _K_BZ = 3, 4, 5          # beta (center velocity)
_K_R, _K_R2 = 6, 7                     # signed radius, radius^2
_K_MTYPE, _K_FUZZ, _K_IOR = 8, 9, 10
_K_TTYPE = 11
_K_C1R, _K_C1G, _K_C1B = 12, 13, 14
_K_C2R, _K_C2G, _K_C2B = 15, 16, 17
_K_TSCALE = 18
KT_ROWS = 24                           # padded to a sublane multiple

# Planar (rect + triangle, rects first — the fused kernel's planar index
# order) kernel-table row layout (KP, R). Mirrors replay._pack_planar's
# geometry affines minus the texture-UV rows (unused by solid/checker).
_P_NX, _P_NY, _P_NZ = 0, 1, 2          # plane normal n
_P_K = 3                               # plane offset: t = (o.n - k)/(-d.n)
_P_UAX, _P_UAY, _P_UAZ = 4, 5, 6       # u_b = ua.p + ca
_P_CA = 7
_P_UBX, _P_UBY, _P_UBZ = 8, 9, 10      # v_b = ub.p + cb
_P_CB = 11
_P_S0X, _P_S0Y, _P_S0Z = 12, 13, 14    # outward = ns0 + u_b*nsu + v_b*nsv
_P_SUX, _P_SUY, _P_SUZ = 15, 16, 17
_P_SVX, _P_SVY, _P_SVZ = 18, 19, 20
_P_MTYPE, _P_FUZZ, _P_IOR = 21, 22, 23
_P_TTYPE = 24
_P_C1R, _P_C1G, _P_C1B = 25, 26, 27
_P_C2R, _P_C2G, _P_C2B = 28, 29, 30
_P_TSCALE = 31
KP_ROWS = 32


def _mat_tail_rows(scene: SceneData, mat: Array) -> list[Array]:
    """The 11 material/texture parameter rows shared by both tables."""
    mt, tx = scene.materials, scene.textures
    tid = mt.tex[mat]
    c1c = tx.color1[tid]
    c2c = tx.color2[tid]
    return [
        mt.mtype[mat].astype(jnp.float32),
        mt.fuzz[mat], mt.ior[mat],
        tx.ttype[tid].astype(jnp.float32),
        c1c[:, 0], c1c[:, 1], c1c[:, 2],
        c2c[:, 0], c2c[:, 1], c2c[:, 2],
        tx.scale[tid],
    ]


def pack_ktab(scene: SceneData) -> Array:
    """(KT, S) differentiable sphere table for the replay-bwd kernel.

    Same coefficient definitions as replay._pack_spheres (alpha/beta
    affine center, signed radius) with the material/texture tail resolved
    to rows; jax.vjp of this function routes the kernel's d(ktab)
    back to the scene pytree leaves."""
    sp = scene.spheres
    dt = sp.t1 - sp.t0
    beta = (sp.c1 - sp.c0) / jnp.where(dt == 0, 1.0, dt)[:, None]
    alpha = sp.c0 - sp.t0[:, None] * beta
    rows = [
        alpha[:, 0], alpha[:, 1], alpha[:, 2],
        beta[:, 0], beta[:, 1], beta[:, 2],
        sp.radius, sp.radius ** 2,
        *_mat_tail_rows(scene, sp.mat),
    ]
    tab = jnp.stack(rows, axis=0).astype(jnp.float32)
    return jnp.pad(tab, ((0, KT_ROWS - tab.shape[0]), (0, 0)))


def pack_ptab(scene: SceneData, static: SceneStatic) -> Array:
    """(KP, R + T) unified rect+triangle table, rects first.

    Same coefficient definitions as replay._pack_planar (which mirrors the
    fused megakernel's planar planes): t = (o.n - k)/(-n.d),
    u_b = ua.p + ca, v_b = ub.p + cb, outward = ns0 + u_b*nsu + v_b*nsv."""
    parts = []
    if static.n_rects:
        rc = scene.rects
        f_ax = jnp.asarray(rc.axis)
        a_ax = jnp.where(f_ax == 0, 1, 0)
        b_ax = jnp.where(f_ax == 2, 1, 2)
        eye = jnp.eye(3, dtype=jnp.float32)
        n = eye[f_ax]
        da = rc.a1 - rc.a0
        db = rc.b1 - rc.b0
        inv_da = 1.0 / jnp.where(da == 0, 1.0, da)
        inv_db = 1.0 / jnp.where(db == 0, 1.0, db)
        ua = eye[a_ax] * inv_da[:, None]
        ub = eye[b_ax] * inv_db[:, None]
        Rn = rc.axis.shape[0]
        z = jnp.zeros((Rn,), jnp.float32)
        rows = [n[:, 0], n[:, 1], n[:, 2], rc.k,
                ua[:, 0], ua[:, 1], ua[:, 2], -rc.a0 * inv_da,
                ub[:, 0], ub[:, 1], ub[:, 2], -rc.b0 * inv_db,
                n[:, 0], n[:, 1], n[:, 2],                 # ns0 = n
                z, z, z, z, z, z,                          # nsu, nsv = 0
                *_mat_tail_rows(scene, rc.mat)]
        parts.append(jnp.stack(rows, axis=0))
    if static.n_triangles:
        tr = scene.triangles
        ab = tr.v1 - tr.v0
        ac = tr.v2 - tr.v0
        n = cross(ab, ac)
        nsq = jnp.sum(n * n, axis=1)
        inv_nsq = (1.0 / jnp.where(nsq == 0, 1.0, nsq))[:, None]
        ua = cross(ac, n) * inv_nsq
        ub = cross(n, ab) * inv_nsq
        nsu = tr.n1 - tr.n0
        nsv = tr.n2 - tr.n0
        rows = [n[:, 0], n[:, 1], n[:, 2], jnp.sum(n * tr.v0, axis=1),
                ua[:, 0], ua[:, 1], ua[:, 2], -jnp.sum(ua * tr.v0, axis=1),
                ub[:, 0], ub[:, 1], ub[:, 2], -jnp.sum(ub * tr.v0, axis=1),
                tr.n0[:, 0], tr.n0[:, 1], tr.n0[:, 2],
                nsu[:, 0], nsu[:, 1], nsu[:, 2],
                nsv[:, 0], nsv[:, 1], nsv[:, 2],
                *_mat_tail_rows(scene, tr.mat)]
        parts.append(jnp.stack(rows, axis=0))
    tab = jnp.concatenate(parts, axis=1).astype(jnp.float32)
    return jnp.pad(tab, ((0, KP_ROWS - tab.shape[0]), (0, 0)))


def _kernel(refs, *, max_depth: int, t_min: float, tile_b: int,
            s_pad: int, r_pad: int, has_sph: bool, has_pla: bool,
            defer: bool = False, defer_noise: bool = False):
    it = iter(refs)
    par_ref = next(it)
    ipar_ref = next(it)
    trips_ref = next(it)
    rid_ref = next(it)
    o_ref = next(it)
    d_ref = next(it)
    tm_ref = next(it)
    cod_ref = next(it)
    g_ref = next(it)                        # (24, L) or (24*D, L) if defer
    cabc_ref = next(it) if defer_noise else None
    ktab_ref = next(it) if has_sph else None
    ptab_ref = next(it) if has_pla else None
    dtab_ref = next(it) if has_sph else None
    dptab_ref = next(it) if has_pla else None
    do_ref = next(it)
    dd_ref = next(it)
    dtm_ref = next(it)
    dbg_ref = next(it)
    st_ref = next(it)
    row_ref = next(it) if has_sph else None
    prow_ref = next(it) if has_pla else None

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

    dn_g = (((1,), (0,)), ((), ()))     # contract the prim axis (gather)
    dn_t = (((1,), (1,)), ((), ()))     # contract the lane axis (transpose)

    # Mosaic iota must be integer-typed; convert once (loop-invariant).
    iota_s = (jax.lax.broadcasted_iota(jnp.int32, (s_pad, L), 0).astype(f)
              if has_sph else None)
    iota_p = (jax.lax.broadcasted_iota(jnp.int32, (r_pad, L), 0).astype(f)
              if has_pla else None)

    def _codes(k, alive_m):
        """hit/family masks + per-family masked indices for bounce k."""
        code = cod_ref[pl.ds(k * 8, 8), :]
        hitf = jnp.where((code > 0.5) & (alive_m > 0.0), one_f, zero_f)
        idx = jnp.floor(code * 0.25)            # (code - fam) / 4
        fam = code - 4.0 * idx
        sphf = jnp.where((hitf > 0.0) & (fam == 1.0), one_f, zero_f)
        plaf = jnp.where((hitf > 0.0) & (fam == 2.0), one_f, zero_f)
        if not has_pla:
            plaf = zero_f
        if not has_sph:
            sphf = zero_f
        idx_s = jnp.where(sphf > 0.0, idx, zero_f)
        idx_p = jnp.where(plaf > 0.0, idx, zero_f)
        return hitf, sphf, plaf, idx_s, idx_p

    def _acc_transposed(dref, crows, iota, idx, n_rows):
        """dref += sum_lanes cot x one-hot, per sublane row. The cotangent
        is split into three bf16-exact mantissa pieces and contracted in
        ONE DEFAULT-precision dot over a 3L-wide lane axis (the one-hot is
        0/1, exact in bf16) — equal to the HIGHEST-precision dot up to
        summation order at half its pass count (3 vs 6; measured the
        HIGHEST accumulation dominated the reverse sweep)."""
        for s in range(8):
            cot = jnp.concatenate(
                [cr_[s:s + 1, :] for cr_ in crows], axis=0)    # (rows, L)
            ch = _bf16_trunc(cot)
            cm = _bf16_trunc(cot - ch)
            cl = cot - ch - cm
            cot3 = jnp.concatenate([ch, cm, cl], axis=1)       # (rows, 3L)
            oh = jnp.where(iota == idx[s:s + 1, :], f(1.0), f(0.0))
            oh3 = jnp.concatenate([oh, oh, oh], axis=1)        # (prim, 3L)
            dref[:, :] = dref[:, :] + jax.lax.dot_general(
                cot3, oh3, dn_t, preferred_element_type=f)

    def _gather(tab_ref, iota, idx, n_rows, stash_ref, stash_base):
        """One-hot [hi; lo]-split row gather for all 8 sublane rows; rows
        stashed for the reverse sweep. Returns the 8 per-sublane (rows, L)
        blocks."""
        rows8 = []
        for s in range(8):
            oh = jnp.where(iota == idx[s:s + 1, :], f(1.0), f(0.0))
            pr = jax.lax.dot_general(tab_ref[0:2 * n_rows, :], oh, dn_g,
                                     preferred_element_type=f)
            rows8.append(pr[0:n_rows] + pr[n_rows:2 * n_rows])
            stash_ref[pl.ds(stash_base + s * n_rows, n_rows), :] = rows8[s]
        return rows8

    def _G(rows8):
        def g(r):
            return jnp.concatenate([rw[r:r + 1, :] for rw in rows8], axis=0)
        return g

    def _sphere_vals(G, ox, oy, oz, dx, dy, dz, a):
        """Sphere quadratic forward values from gathered rows."""
        cx = G(_K_AX) + time * G(_K_BX)
        cy = G(_K_AY) + time * G(_K_BY)
        cz = G(_K_AZ) + time * G(_K_BZ)
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        half_b = ocx * dx + ocy * dy + ocz * dz
        c_t = ocx * ocx + ocy * ocy + ocz * ocz - G(_K_R2)
        disc = half_b * half_b - a * c_t
        sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
        # Padded/dead lanes carry d = 0 (a = 0): a raw 1/a would produce
        # inf, and masked-zero cotangents times inf are NaN — one NaN
        # lane poisons every table column through the one-hot dot.
        inv_a = 1.0 / jnp.maximum(a, f(1e-20))
        root1 = (-half_b - sq) * inv_a
        root2 = (-half_b + sq) * inv_a
        near = jnp.where(root1 >= f(t_min), one_f, zero_f)
        t_s = jnp.where(near > 0.0, root1, root2)
        return dict(cx=cx, cy=cy, cz=cz, ocx=ocx, ocy=ocy, ocz=ocz,
                    half_b=half_b, c_t=c_t, disc=disc, sq=sq, inv_a=inv_a,
                    near=near, t=t_s)

    def _planar_vals(G, ox, oy, oz, dx, dy, dz):
        """Planar affine forward values from gathered rows."""
        pnx, pny, pnz = G(_P_NX), G(_P_NY), G(_P_NZ)
        df = -(dx * pnx + dy * pny + dz * pnz)
        inv_df = 1.0 / jnp.where(df == 0.0, 1.0, df)
        t_p = (ox * pnx + oy * pny + oz * pnz - G(_P_K)) * inv_df
        return dict(pnx=pnx, pny=pny, pnz=pnz, inv_df=inv_df, t=t_p)

    def _tex_cols(G, ttype_row, c1r, c1g, c1b, c2r, c2g, c2b, scale_row,
                  px, py, pz):
        """Texture value from table rows at point p: solid/checker inline;
        deferred rows (noise/image, ttype >= 2) shade as 1.0 — exactly the
        forward megakernel's deferred-texture convention (the true texel is
        applied/differentiated outside, _combine_deferred)."""
        scale = G(scale_row)
        ttype = G(ttype_row)
        sines = (jnp.sin(scale * px) * jnp.sin(scale * py)
                 * jnp.sin(scale * pz))
        use2 = jnp.where((ttype == 1.0) & (sines < 0.0), one_f,
                         zero_f)
        live = jnp.where(ttype <= 1.5, one_f, zero_f)
        noise = jnp.where(ttype == 2.0, one_f, zero_f)
        tex_r = live * (use2 * G(c2r) + (1.0 - use2) * G(c1r)) + (1.0 - live)
        tex_g = live * (use2 * G(c2g) + (1.0 - use2) * G(c1g)) + (1.0 - live)
        tex_b = live * (use2 * G(c2b) + (1.0 - use2) * G(c1b)) + (1.0 - live)
        return use2, live, noise, tex_r, tex_g, tex_b

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

        hitf, sphf, plaf, idx_s, idx_p = _codes(k, alive_m)
        a = dx * dx + dy * dy + dz * dz

        t = zero_f
        if has_sph:
            rows_s = _gather(ktab_ref, iota_s, idx_s, KT_ROWS, row_ref,
                             k * 8 * KT_ROWS)
            Gs = _G(rows_s)
            sv = _sphere_vals(Gs, ox, oy, oz, dx, dy, dz, a)
            t = t + sphf * sv["t"]
        if has_pla:
            rows_p = _gather(ptab_ref, iota_p, idx_p, KP_ROWS, prow_ref,
                             k * 8 * KP_ROWS)
            Gp = _G(rows_p)
            pv = _planar_vals(Gp, ox, oy, oz, dx, dy, dz)
            t = t + plaf * pv["t"]

        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz

        nx_o = zero_f
        ny_o = zero_f
        nz_o = zero_f
        mtype = zero_f
        fuzz = zero_f
        ior = zero_f
        tex_r = zero_f
        tex_g = zero_f
        tex_b = zero_f
        if has_sph:
            inv_r = 1.0 / jnp.where(Gs(_K_R) == 0.0, 1.0, Gs(_K_R))
            nx_o = nx_o + sphf * (px - sv["cx"]) * inv_r
            ny_o = ny_o + sphf * (py - sv["cy"]) * inv_r
            nz_o = nz_o + sphf * (pz - sv["cz"]) * inv_r
            mtype = mtype + sphf * Gs(_K_MTYPE)
            fuzz = fuzz + sphf * Gs(_K_FUZZ)
            ior = ior + sphf * Gs(_K_IOR)
            _, _, _, txr, txg, txb = _tex_cols(Gs, _K_TTYPE, _K_C1R,
                                               _K_C1G, _K_C1B, _K_C2R,
                                               _K_C2G, _K_C2B,
                                               _K_TSCALE, px, py, pz)
            tex_r = tex_r + sphf * txr
            tex_g = tex_g + sphf * txg
            tex_b = tex_b + sphf * txb
        if has_pla:
            u_b = (Gp(_P_UAX) * px + Gp(_P_UAY) * py + Gp(_P_UAZ) * pz
                   + Gp(_P_CA))
            v_b = (Gp(_P_UBX) * px + Gp(_P_UBY) * py + Gp(_P_UBZ) * pz
                   + Gp(_P_CB))
            nx_o = nx_o + plaf * (Gp(_P_S0X) + u_b * Gp(_P_SUX)
                                  + v_b * Gp(_P_SVX))
            ny_o = ny_o + plaf * (Gp(_P_S0Y) + u_b * Gp(_P_SUY)
                                  + v_b * Gp(_P_SVY))
            nz_o = nz_o + plaf * (Gp(_P_S0Z) + u_b * Gp(_P_SUZ)
                                  + v_b * Gp(_P_SVZ))
            mtype = mtype + plaf * Gp(_P_MTYPE)
            fuzz = fuzz + plaf * Gp(_P_FUZZ)
            ior = ior + plaf * Gp(_P_IOR)
            _, _, _, txr, txg, txb = _tex_cols(Gp, _P_TTYPE, _P_C1R,
                                               _P_C1G, _P_C1B, _P_C2R,
                                               _P_C2G, _P_C2B,
                                               _P_TSCALE, px, py, pz)
            tex_r = tex_r + plaf * txr
            tex_g = tex_g + plaf * txg
            tex_b = tex_b + plaf * txb
        # Dead/miss lanes: ior = 0 would make 1/ior inf — clamp handles it.

        frontf = jnp.where(dx * nx_o + dy * ny_o + dz * nz_o < 0.0,
                           one_f, zero_f)
        sgn = 2.0 * frontf - 1.0
        nx, ny, nz = nx_o * sgn, ny_o * sgn, nz_o * sgn

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
        u_dot_n = ux * nx + uy * ny + uz * nz
        metx = ux - 2.0 * u_dot_n * nx + fuzz * bx3 * brad
        mety = uy - 2.0 * u_dot_n * ny + fuzz * by3 * brad
        metz = uz - 2.0 * u_dot_n * nz + fuzz * bz3 * brad
        met_alive = (metx * nx + mety * ny + metz * nz) > 0.0

        e1, _, _, _ = _rand4(rid, depth_u, rt_rng.SALT_DIELECTRIC, seed)
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

    # Per-tile dynamic trip count (host-derived from the codes): bounces
    # past the tile's last live lane are exact no-ops in both sweeps —
    # skipping them reclaims the dead-tail occupancy (sky tiles process
    # one bounce, not D).
    trip = trips_ref[0, pl.program_id(0)]

    init = (ox0, oy0, oz0, dx0, dy0, dz0, one_f, one_f, one_f,
            jnp.where(in_chunk > 0.0, one_f, zero_f))
    jax.lax.fori_loop(0, trip, fwd_body, init)

    # ---------------- reverse sweep --------------------------------------
    if not defer:
        g_r0 = g_ref[0:8, :]
        g_g0 = g_ref[8:16, :]
        g_b0 = g_ref[16:24, :]

    @pl.when(pl.program_id(0) == 0)
    def _init_dtab():
        if has_sph:
            dtab_ref[:, :] = jnp.zeros(dtab_ref.shape, f)
        if has_pla:
            dptab_ref[:, :] = jnp.zeros(dptab_ref.shape, f)

    dbg_ref[:, :] = jnp.zeros(dbg_ref.shape, f)

    def rev_body(kk, carry):
        k = trip - 1 - kk
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

        hitf, sphf, plaf, idx_s, idx_p = _codes(k, alive_m)
        missf = jnp.where((alive_m > 0.0) & (hitf <= 0.0), one_f, zero_f)
        a = dx * dx + dy * dy + dz * dz

        if defer:
            # Per-bounce radiance cotangent: g scaled by the deferred
            # factor cumprod (jax.vjp of _combine_deferred w.r.t. ctb).
            g_r = g_ref[pl.ds(k * 24, 8), :]
            g_g = g_ref[pl.ds(k * 24 + 8, 8), :]
            g_b = g_ref[pl.ds(k * 24 + 16, 8), :]
        else:
            g_r, g_g, g_b = g_r0, g_g0, g_b0

        # recompute the bounce's forward intermediates from stashed rows
        t = zero_f
        if has_sph:
            rows_s = [row_ref[pl.ds(k * 8 * KT_ROWS + s * KT_ROWS,
                                    KT_ROWS), :] for s in range(8)]
            Gs = _G(rows_s)
            sv = _sphere_vals(Gs, ox, oy, oz, dx, dy, dz, a)
            t = t + sphf * sv["t"]
        if has_pla:
            rows_p = [prow_ref[pl.ds(k * 8 * KP_ROWS + s * KP_ROWS,
                                     KP_ROWS), :] for s in range(8)]
            Gp = _G(rows_p)
            pv = _planar_vals(Gp, ox, oy, oz, dx, dy, dz)
            t = t + plaf * pv["t"]

        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz

        nx_o = zero_f
        ny_o = zero_f
        nz_o = zero_f
        mtype = zero_f
        fuzz = zero_f
        ior = zero_f
        tex_r = zero_f
        tex_g = zero_f
        tex_b = zero_f
        if has_sph:
            rr = Gs(_K_R)
            inv_r = 1.0 / jnp.where(rr == 0.0, 1.0, rr)
            snx = (px - sv["cx"]) * inv_r
            sny = (py - sv["cy"]) * inv_r
            snz = (pz - sv["cz"]) * inv_r
            nx_o = nx_o + sphf * snx
            ny_o = ny_o + sphf * sny
            nz_o = nz_o + sphf * snz
            mtype = mtype + sphf * Gs(_K_MTYPE)
            fuzz = fuzz + sphf * Gs(_K_FUZZ)
            ior = ior + sphf * Gs(_K_IOR)
            use2_s, live_s, noise_s, txr, txg, txb = _tex_cols(
                Gs, _K_TTYPE, _K_C1R, _K_C1G, _K_C1B, _K_C2R, _K_C2G,
                _K_C2B, _K_TSCALE, px, py, pz)
            tex_r = tex_r + sphf * txr
            tex_g = tex_g + sphf * txg
            tex_b = tex_b + sphf * txb
        if has_pla:
            u_b = (Gp(_P_UAX) * px + Gp(_P_UAY) * py + Gp(_P_UAZ) * pz
                   + Gp(_P_CA))
            v_b = (Gp(_P_UBX) * px + Gp(_P_UBY) * py + Gp(_P_UBZ) * pz
                   + Gp(_P_CB))
            nx_o = nx_o + plaf * (Gp(_P_S0X) + u_b * Gp(_P_SUX)
                                  + v_b * Gp(_P_SVX))
            ny_o = ny_o + plaf * (Gp(_P_S0Y) + u_b * Gp(_P_SUY)
                                  + v_b * Gp(_P_SVY))
            nz_o = nz_o + plaf * (Gp(_P_S0Z) + u_b * Gp(_P_SUZ)
                                  + v_b * Gp(_P_SVZ))
            mtype = mtype + plaf * Gp(_P_MTYPE)
            fuzz = fuzz + plaf * Gp(_P_FUZZ)
            ior = ior + plaf * Gp(_P_IOR)
            use2_p, live_p, noise_p, txr, txg, txb = _tex_cols(
                Gp, _P_TTYPE, _P_C1R, _P_C1G, _P_C1B, _P_C2R, _P_C2G,
                _P_C2B, _P_TSCALE, px, py, pz)
            tex_r = tex_r + plaf * txr
            tex_g = tex_g + plaf * txg
            tex_b = tex_b + plaf * txb

        frontf = jnp.where(dx * nx_o + dy * ny_o + dz * nz_o < 0.0,
                           one_f, zero_f)
        sgn = 2.0 * frontf - 1.0
        nx, ny, nz = nx_o * sgn, ny_o * sgn, nz_o * sgn

        is_met = mtype == 1.0
        is_die = mtype == 2.0
        is_lightf = jnp.where(mtype == 3.0, one_f, zero_f)
        is_lamf = jnp.where(~is_met & ~is_die & (is_lightf == 0.0),
                            one_f, zero_f)

        depth_u = jax.lax.bitcast_convert_type(lane0 + k, jnp.uint32)
        inv_len = 1.0 / jnp.sqrt(a + f(1e-20))
        ux, uy, uz = dx * inv_len, dy * inv_len, dz * inv_len
        u_dot_n = ux * nx + uy * ny + uz * nz

        m1_, m2_, m3_, _ = _rand4(rid, depth_u, rt_rng.SALT_METAL, seed)
        bx3, by3, bz3 = _unit_vec(m1_, m2_)
        brad = jnp.exp(jnp.log(jnp.maximum(m3_, f(1e-30))) * f(1.0 / 3.0))
        metx = ux - 2.0 * u_dot_n * nx + fuzz * bx3 * brad
        mety = uy - 2.0 * u_dot_n * ny + fuzz * by3 * brad
        metz = uz - 2.0 * u_dot_n * nz + fuzz * bz3 * brad
        met_alive = (metx * nx + mety * ny + metz * nz) > 0.0

        e1, _, _, _ = _rand4(rid, depth_u, rt_rng.SALT_DIELECTRIC, seed)
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
        if defer_noise:
            # Noise-marble deferred records store abc = p: the outside
            # combine's d(abc) cotangent enters the hit point here and
            # rides the family geometry chains back to tables/o0/d0.
            noisef = zero_f
            if has_sph:
                noisef = noisef + sphf * noise_s
            if has_pla:
                noisef = noisef + plaf * noise_p
            cpx = cpx + noisef * cabc_ref[pl.ds(k * 24, 8), :]
            cpy = cpy + noisef * cabc_ref[pl.ds(k * 24 + 8, 8), :]
            cpz = cpz + noisef * cabc_ref[pl.ds(k * 24 + 16, 8), :]
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
        if defer:
            # Deferred rows shade tex = 1.0 (constant): their texel
            # cotangent belongs to the outside combine, not to c1/c2.
            livef = zero_f
            if has_sph:
                livef = livef + sphf * live_s
            if has_pla:
                livef = livef + plaf * live_p
            ctex_r = ctex_r * livef
            ctex_g = ctex_g * livef
            ctex_b = ctex_b * livef

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

        # n = sgn * outward; route outward + hit-point cotangents per
        # family (each family's chain is masked by its own winner flag so
        # a planar lane contributes nothing through the sphere chain and
        # vice versa).
        if has_sph:
            co_x = sgn * cnx * sphf
            co_y = sgn * cny * sphf
            co_z = sgn * cnz * sphf
            # outward = (p - c)/r
            cpx_s = sphf * cpx + co_x * inv_r
            cpy_s = sphf * cpy + co_y * inv_r
            cpz_s = sphf * cpz + co_z * inv_r
            ccx = -co_x * inv_r
            ccy = -co_y * inv_r
            ccz = -co_z * inv_r
            c_r = -(snx * co_x + sny * co_y + snz * co_z) * inv_r

            # p = o + t*d
            ct = (dx * cpx_s + dy * cpy_s + dz * cpz_s) * sphf
            cox = cox + cpx_s
            coy = coy + cpy_s
            coz = coz + cpz_s
            cdx = cdx + t * cpx_s
            cdy = cdy + t * cpy_s
            cdz = cdz + t * cpz_s

            # t = (-half_b -+ sq)/a (selected root)
            s_r = 2.0 * (1.0 - sv["near"]) - 1.0  # -1 near, +1 far root
            inv_a = sv["inv_a"]
            t_s = sv["t"]
            csq = ct * s_r * inv_a
            chb = -ct * inv_a
            ca = -ct * t_s * inv_a
            okd = jnp.where(sv["disc"] > 0.0, one_f, zero_f)
            cdisc = okd * csq / (2.0 * sv["sq"])
            chb = chb + 2.0 * sv["half_b"] * cdisc
            ca = ca - sv["c_t"] * cdisc
            cct = -a * cdisc
            # half_b = oc.d ; c = oc.oc - r2 ; a = d.d
            ocx, ocy, ocz = sv["ocx"], sv["ocy"], sv["ocz"]
            cocx = chb * dx + 2.0 * cct * ocx
            cocy = chb * dy + 2.0 * cct * ocy
            cocz = chb * dz + 2.0 * cct * ocz
            cdx = cdx + chb * ocx + 2.0 * ca * dx
            cdy = cdy + chb * ocy + 2.0 * ca * dy
            cdz = cdz + chb * ocz + 2.0 * ca * dz
            cr2 = -cct
            # oc = o - c
            cox = cox + cocx
            coy = coy + cocy
            coz = coz + cocz
            ccx = ccx - cocx
            ccy = ccy - cocy
            ccz = ccz - cocz
            # c = alpha + time*beta
            ctime = (ctime + Gs(_K_BX) * ccx + Gs(_K_BY) * ccy
                     + Gs(_K_BZ) * ccz)

            # tex select -> c1/c2 rows (sphere's own checker select)
            dc1s_r = sphf * (1.0 - use2_s) * ctex_r
            dc1s_g = sphf * (1.0 - use2_s) * ctex_g
            dc1s_b = sphf * (1.0 - use2_s) * ctex_b
            dc2s_r = sphf * use2_s * ctex_r
            dc2s_g = sphf * use2_s * ctex_g
            dc2s_b = sphf * use2_s * ctex_b

            crows_s = [ccx, ccy, ccz,                              # alpha
                       time * ccx, time * ccy, time * ccz,         # beta
                       c_r, cr2,                                   # r, r2
                       zero_f,                                     # mtype
                       cfuzz * sphf, cior * sphf,                  # fuzz,ior
                       zero_f,                                     # ttype
                       dc1s_r, dc1s_g, dc1s_b,
                       dc2s_r, dc2s_g, dc2s_b,
                       zero_f,                                     # scale
                       zero_f, zero_f, zero_f, zero_f, zero_f]     # pad
            _acc_transposed(dtab_ref, crows_s, iota_s, idx_s, KT_ROWS)

        if has_pla:
            cno_x = sgn * cnx * plaf
            cno_y = sgn * cny * plaf
            cno_z = sgn * cnz * plaf
            # outward = ns0 + u_b*nsu + v_b*nsv
            c_nsu_x = u_b * cno_x
            c_nsu_y = u_b * cno_y
            c_nsu_z = u_b * cno_z
            c_nsv_x = v_b * cno_x
            c_nsv_y = v_b * cno_y
            c_nsv_z = v_b * cno_z
            cu_b = (Gp(_P_SUX) * cno_x + Gp(_P_SUY) * cno_y
                    + Gp(_P_SUZ) * cno_z)
            cv_b = (Gp(_P_SVX) * cno_x + Gp(_P_SVY) * cno_y
                    + Gp(_P_SVZ) * cno_z)
            # u_b = ua.p + ca ; v_b = ub.p + cb
            c_ua_x = cu_b * px
            c_ua_y = cu_b * py
            c_ua_z = cu_b * pz
            c_ub_x = cv_b * px
            c_ub_y = cv_b * py
            c_ub_z = cv_b * pz
            cpx_p = plaf * cpx + cu_b * Gp(_P_UAX) + cv_b * Gp(_P_UBX)
            cpy_p = plaf * cpy + cu_b * Gp(_P_UAY) + cv_b * Gp(_P_UBY)
            cpz_p = plaf * cpz + cu_b * Gp(_P_UAZ) + cv_b * Gp(_P_UBZ)

            # p = o + t*d
            ct_p = (dx * cpx_p + dy * cpy_p + dz * cpz_p) * plaf
            cox = cox + cpx_p
            coy = coy + cpy_p
            coz = coz + cpz_p
            cdx = cdx + t * cpx_p
            cdy = cdy + t * cpy_p
            cdz = cdz + t * cpz_p

            # t = (o.n - k)/df with df = -d.n:
            #   dt/do = n/df ; dt/dk = -1/df ; dt/dn = p/df ; dt/dd = t*n/df
            inv_df = pv["inv_df"]
            t_pl = pv["t"]
            pnx, pny, pnz = pv["pnx"], pv["pny"], pv["pnz"]
            cti = ct_p * inv_df
            cox = cox + cti * pnx
            coy = coy + cti * pny
            coz = coz + cti * pnz
            cdx = cdx + cti * t_pl * pnx
            cdy = cdy + cti * t_pl * pny
            cdz = cdz + cti * t_pl * pnz
            c_pn_x = cti * px
            c_pn_y = cti * py
            c_pn_z = cti * pz
            c_k = -cti

            dc1p_r = plaf * (1.0 - use2_p) * ctex_r
            dc1p_g = plaf * (1.0 - use2_p) * ctex_g
            dc1p_b = plaf * (1.0 - use2_p) * ctex_b
            dc2p_r = plaf * use2_p * ctex_r
            dc2p_g = plaf * use2_p * ctex_g
            dc2p_b = plaf * use2_p * ctex_b

            crows_p = [c_pn_x, c_pn_y, c_pn_z, c_k,
                       c_ua_x, c_ua_y, c_ua_z, cu_b,                # ua, ca
                       c_ub_x, c_ub_y, c_ub_z, cv_b,                # ub, cb
                       cno_x, cno_y, cno_z,                         # ns0
                       c_nsu_x, c_nsu_y, c_nsu_z,
                       c_nsv_x, c_nsv_y, c_nsv_z,
                       zero_f,                                      # mtype
                       cfuzz * plaf, cior * plaf,                   # fuzz,ior
                       zero_f,                                      # ttype
                       dc1p_r, dc1p_g, dc1p_b,
                       dc2p_r, dc2p_g, dc2p_b,
                       zero_f]                                      # scale
            _acc_transposed(dptab_ref, crows_p, iota_p, idx_p, KP_ROWS)

        return (cox, coy, coz, cdx, cdy, cdz, ctr, ctg, ctb, ctime)

    rev0 = (zero_f,) * 6 + (zero_f, zero_f, zero_f, zero_f)
    (cox, coy, coz, cdx, cdy, cdz, _, _, _, ctime) = jax.lax.fori_loop(
        0, trip, rev_body, rev0)

    do_ref[0:8, :] = cox
    do_ref[8:16, :] = coy
    do_ref[16:24, :] = coz
    dd_ref[0:8, :] = cdx
    dd_ref[8:16, :] = cdy
    dd_ref[16:24, :] = cdz
    dtm_ref[0:8, :] = ctime


def _kernel_entry(*refs, **params):
    _kernel(refs, **params)


@functools.partial(jax.jit, static_argnames=("cfg", "n_chunk", "interpret"))
def replay_bwd_fused(ktab, ptab, background: Array, cfg: RenderConfig,
                     o: Array, d: Array, time: Array, ray_id: Array,
                     seed, codes: Array, g: Array, n_chunk: int,
                     interpret: bool = False, cabc=None):
    """Run the fused replay backward.

    ktab (KT, S) / ptab (KP, R) may each be None when the family is absent.
    g is the radiance cotangent: (B, 3) for inline-texture scenes, or
    (B, D, 3) per-bounce cotangents for deferred-texture scenes (jax.vjp
    of _combine_deferred w.r.t. ctb); cabc (B, D, 3) optionally carries
    the combine's d(abc) cotangent (noise hit points) back into the
    kernel's geometry chains.
    Returns (dktab | None, dptab | None, d_o (B, 3), d_d (B, 3),
    d_time (B,), d_bg (3,))."""
    has_sph = ktab is not None
    has_pla = ptab is not None
    defer = g.ndim == 3
    defer_noise = cabc is not None

    def _split(tab):
        n = tab.shape[1]
        pad = _round_up(max(n, 128), 128)
        tab = jnp.pad(tab, ((0, 0), (0, pad - n)))
        hi = _bf16_trunc(tab)
        return jnp.concatenate([hi, tab - hi], axis=0), pad, n

    s_pad = r_pad = 128
    S = R = 0
    ktab_split = ptab_split = None
    if has_sph:
        ktab_split, s_pad, S = _split(ktab)
    if has_pla:
        ptab_split, r_pad, R = _split(ptab)

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
    if defer:
        g_p = jnp.concatenate([_wide3(g[:, k, :]) for k in range(D)], axis=0)
    else:
        g_p = _wide3(g)
    cabc_p = (jnp.concatenate([_wide3(cabc[:, k, :]) for k in range(D)],
                              axis=0) if defer_noise else None)
    cod_p = jnp.concatenate([_wide(codes[:, k]) for k in range(D)], axis=0)

    par = jnp.concatenate([
        jnp.asarray(background, jnp.float32).reshape(3),
        jnp.zeros((5,), jnp.float32),
    ]).reshape(1, 8)
    ipar = jnp.asarray(seed, jnp.uint32).astype(jnp.int32).reshape(1, 1)

    # Per-tile trip counts: a lane can need processing at bounce k only if
    # some lane of its tile had a hit at k-1 (alive_at(k) requires
    # code[k-1] > 0), plus one trailing bounce for the miss/background
    # term. Sky tiles process 1 bounce instead of D.
    code_hit = jnp.pad(codes > 0.5, ((0, b_pad - n_chunk), (0, 0)))
    tile_hit = code_hit.reshape(n_tiles, tile_b, D).any(axis=1)
    any_hit = tile_hit.any(axis=1)
    last = (D - 1) - jnp.argmax(tile_hit[:, ::-1].astype(jnp.int32), axis=1)
    last = jnp.where(any_hit, last, -1)
    trips = jnp.minimum(D, last + 2).astype(jnp.int32).reshape(1, n_tiles)

    kernel = functools.partial(_kernel_entry, max_depth=D, t_min=cfg.t_min,
                               tile_b=tile_b, s_pad=s_pad, r_pad=r_pad,
                               has_sph=has_sph, has_pla=has_pla,
                               defer=defer, defer_noise=defer_noise)
    grid = (n_tiles,)

    g_rows = 24 * D if defer else 24
    inputs = [par, ipar, trips, rid_p, o_p, d_p, tm_p, cod_p, g_p]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
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
        pl.BlockSpec((g_rows, lanes_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    if defer_noise:
        inputs.append(cabc_p)
        in_specs.append(pl.BlockSpec((24 * D, lanes_l), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
    if has_sph:
        inputs.append(ktab_split)
        in_specs.append(pl.BlockSpec((2 * KT_ROWS, s_pad), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if has_pla:
        inputs.append(ptab_split)
        in_specs.append(pl.BlockSpec((2 * KP_ROWS, r_pad), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out_shapes = []
    out_specs = []
    if has_sph:
        out_shapes.append(jax.ShapeDtypeStruct((KT_ROWS, s_pad), jnp.float32))
        out_specs.append(pl.BlockSpec((KT_ROWS, s_pad), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    if has_pla:
        out_shapes.append(jax.ShapeDtypeStruct((KP_ROWS, r_pad), jnp.float32))
        out_specs.append(pl.BlockSpec((KP_ROWS, r_pad), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    out_shapes += [
        jax.ShapeDtypeStruct((24, n_tiles * lanes_l), jnp.float32),  # do
        jax.ShapeDtypeStruct((24, n_tiles * lanes_l), jnp.float32),  # dd
        jax.ShapeDtypeStruct((8, n_tiles * lanes_l), jnp.float32),   # dtm
        jax.ShapeDtypeStruct((24, n_tiles * lanes_l), jnp.float32),  # dbg
    ]
    out_specs += [
        pl.BlockSpec((24, lanes_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((24, lanes_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, lanes_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((24, lanes_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]

    scratch_shapes = [pltpu.VMEM((80 * D, lanes_l), jnp.float32)]  # states
    if has_sph:
        scratch_shapes.append(
            pltpu.VMEM((8 * KT_ROWS * D, lanes_l), jnp.float32))   # s rows
    if has_pla:
        scratch_shapes.append(
            pltpu.VMEM((8 * KP_ROWS * D, lanes_l), jnp.float32))   # p rows

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*inputs)

    outs = list(outs)
    dtab = outs.pop(0)[:, :S] if has_sph else None
    dptab = outs.pop(0)[:, :R] if has_pla else None
    do_, dd_, dtm_, dbg_ = outs

    def _unlane(x, ch):
        x = x.reshape(ch, 8, n_tiles, lanes_l)
        return x.transpose(2, 1, 3, 0).reshape(b_pad, ch)[:n_chunk]

    d_o = _unlane(do_, 3)
    d_d = _unlane(dd_, 3)
    d_tm = _unlane(dtm_, 1)[:, 0]
    d_bg = _unlane(dbg_, 3).sum(axis=0)
    return dtab, dptab, d_o, d_d, d_tm, d_bg
