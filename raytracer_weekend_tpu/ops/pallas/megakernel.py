"""Fused path-tracing megakernel: the whole bounce loop in one Pallas call.

Motivation (measured on TPU v5e, jumpy_balls 400x225x16spp d8): the staged
wavefront — camera rays, per-family Pallas intersection, hit-record gathers,
jnp shading — spends ~90% of the frame in XLA glue between kernels
(per-bounce transposes/pads at kernel boundaries, dozens of unfused
(B,3)-sized HBM round trips). This kernel fuses the entire estimator:

    per ray tile (TILE_B lanes, VMEM-resident):
      primary ray generation    (camera.rs:66-74 semantics, in-kernel PCG4D)
      depth loop (early-exits when the whole tile is dead):
        sphere intersection     (spherical.rs:18-60, quadratic coefficients
                                 produced by two MXU matmuls — see below)
        winner one-hot gather   (one (P,S)x(TB,S) MXU matmul)
        hit record + shading    (material.rs scatter union, VPU)
      write radiance + per-lane segment counts

HBM traffic is one (3,B) radiance write + one (1,B) segment write per frame;
everything else lives in VMEM. Scope: sphere-only scenes with
solid/checker-textured Lambertian/Metal/Dielectric/DiffuseLight materials —
exactly the "One Weekend" headline workloads (jumpy_balls, two_spheres).
Scenes outside this subset use the staged wavefront path (integrator.py).

Affine-center intersection (the perf trick): a moving sphere's center
(spherical.rs:117-123, lerp between c0@t0 and c1@t1) is affine in the ray's
shutter time:  c(time) = alpha + time * beta  with  alpha = c0 - t0*invdt*dc,
beta = invdt*dc  (static spheres: beta = 0). The ray-sphere quadratic
  half_b  = o.d - d.c(time)
  c_term  = |o - c(time)|^2 - r^2
is then *linear* in the per-lane feature vectors [d, time*d] and
[o, time*o, 1, time, time^2] with per-sphere coefficient rows
[alpha, beta] and [-2 alpha, -2 beta, |alpha|^2 - r^2, 2 alpha.beta,
|beta|^2]. Two dot_generals against the (rows, S) table produce the full
(TILE_B, S) coefficient planes on the MXU, replacing ~18 VPU ops per plane
element of the naive formulation. Root selection is done in the scaled
domain -t*a (a = |d|^2 > 0), avoiding two full-plane divides; the winner
one-hot is an equality test against the plane max (float-exact ties between
distinct spheres have measure zero; padded slots carry k0 = +1e30 so their
discriminant is always negative, which also removes the per-plane validity
mask).

RNG parity: the in-kernel PCG4D reproduces rng.rand4 streams bit-for-bit
(same (seed, ray_id, depth, salt) keying), so the fused image equals the
staged image up to float-op reassociation (the MXU-factored quadratic
rounds differently on near-tangent hits; tests allow a small flip budget).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_weekend_tpu import rng as rt_rng
from raytracer_weekend_tpu.camera import Camera
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.scene.data import SceneData, SceneStatic

_BIG = 3.0e38   # stand-in for +inf inside the kernel
_K0_INVALID = 1.0e30  # padded-slot k0: forces disc < 0 for any real ray

# Gather/coefficient table row layout (P_ROWS x S). Rows 0:7 feed the
# neg-half_b matmul, rows 7:17 the c_term matmul; one MXU matmul of the
# whole table against the winner one-hot reconstructs every per-hit
# quantity. The per-ray scalars o.d and |o|^2 ride along as extra features
# (coefficient -1 / +1 on valid slots) so half_b and c_term come straight
# off the MXU with no full-plane VPU add/sub.
_R_AX, _R_AY, _R_AZ = 0, 1, 2        # alpha (effective center at time=0)
_R_BX, _R_BY, _R_BZ = 3, 4, 5        # beta  (center velocity in time)
_R_ODOTD = 6                         # -1 (valid) / 0 (padded): o.d feature
_R_M2AX, _R_M2AY, _R_M2AZ = 7, 8, 9  # -2*alpha
_R_M2BX, _R_M2BY, _R_M2BZ = 10, 11, 12  # -2*beta
_R_K0 = 13                           # |alpha|^2 - r^2 (invalid: +1e30)
_R_K1 = 14                           # 2 alpha.beta
_R_K2 = 15                           # |beta|^2
_R_OSQ = 16                          # +1 (valid) / 0 (padded): |o|^2 feature
_R_INVR = 17
_R_MTYPE, _R_FUZZ, _R_IOR = 18, 19, 20
_R_TTYPE = 21
_R_C1R, _R_C1G, _R_C1B = 22, 23, 24
_R_C2R, _R_C2G, _R_C2B = 25, 26, 27
_R_TSCALE = 28
_R_TEXID = 29                        # texture row id (deferred-texture decode)
# Global sphere index for VJP path residuals, SPLIT hi/lo (idx = 128*hi+lo):
# gathers run at bf16-pass precision where ints are exact only to 256.
_R_IDX_HI, _R_IDX_LO = 30, 31
P_ROWS = 32  # padded to a sublane multiple

# Planar-primitive tables: ONE family for axis-aligned rects
# (rectangular.rs:16-167) AND triangles (triangular.rs:97-138). Both are a
# plane hit + two affine in-plane coordinates, fully folded into two matmuls
# per sublane row. Per primitive we precompute (host-side)
#   n  — plane normal: e_f for rects, ab x ac (unnormalized) for triangles
#   k  — plane offset n.p0
#   ua, ca — u dual vector/offset: u = o.ua + ca + t * d.ua
#            rects: e_a/(a1-a0), -a0/(a1-a0)  (rectangular.rs:37-44)
#            tris:  (ac x n)/|n|^2, -ua.v0 — the barycentric dual basis
#                   (ua.ab = 1, ua.ac = 0), so u is triangular.rs:110's u
#   ub, cb — likewise (tris: (n x ab)/|n|^2)
#   flag — 1 for triangles, 0 for rects
# d-features [dx dy dz] against tab_pd -> stacked (3*R, L) planes
#   [DF; U1; V1] = [n; ua; ub] . d
# o-features [ox oy oz 1] against tab_po -> stacked (4*R, L) planes
#   [NUM; U0; V0; FLAG] = [k - o.n; o.ua + ca; o.ub + cb; flag]
# so t = NUM/DF, u = U0 + t*U1, v = V0 + t*V1, hit iff
#   t >= t_min & u >= 0 & v >= 0 & v <= 1 & u + flag*v <= 1
# (flag=0 gives the rect bound u,v in [0,1]; flag=1 the triangle bound
# u,v >= 0, u+v <= 1 — triangular.rs:120-124). Padded slots have all-zero
# coefficients: t = 0/0 = NaN and NaN comparisons kill them.
# Winner gather rows (tab_pg): the shading normal is barycentric-affine,
# nsh = ns0 + u*nsu + v*nsv (rects: ns0 = e_f, nsu = nsv = 0; triangles:
# ns0 = n0, nsu = n1-n0, nsv = n2-n0 — raw, unnormalized, matching
# triangular.rs:126's interpolate_barycentric). Texture UVs likewise:
# tex_u = tu0 + u*tuu + v*tuv (rects: identity; tris from uv0/uv1/uv2).
_RP_NSX, _RP_NSY, _RP_NSZ = 0, 1, 2     # ns0
_RP_NUX, _RP_NUY, _RP_NUZ = 3, 4, 5     # nsu
_RP_NVX, _RP_NVY, _RP_NVZ = 6, 7, 8     # nsv
_RP_MTYPE, _RP_FUZZ, _RP_IOR = 9, 10, 11
_RP_TTYPE = 12
_RP_C1R, _RP_C1G, _RP_C1B = 13, 14, 15
_RP_C2R, _RP_C2G, _RP_C2B = 16, 17, 18
_RP_TSCALE = 19
_RP_TU0, _RP_TUU, _RP_TUV = 20, 21, 22
_RP_TV0, _RP_TVU, _RP_TVV = 23, 24, 25
_RP_TEXID = 26                       # texture row id (deferred-texture decode)
_RP_IDX_HI, _RP_IDX_LO = 27, 28      # split global planar index (see _R_IDX)
PG_ROWS = 32

# Constant-medium volumes (volumes.rs:38-78) ride along as per-volume SMEM
# scalars (V is <= 2 in every reference scene): boundary interval in closed
# form (sphere quadratic / oriented-box slab with the volume's Y-rotation +
# translation), then the probabilistic scatter distance
#   hit_distance = -1/density * log10(U)        (volumes.rs:58 quirk)
# competes in the closest-hit min like any other family (see ops/volume.py
# for why exit-clamping by closest_so_far is equivalent). Rows of the
# (V, VP_COLS) table:
_VP_ISBOX = 0
_VP_CX, _VP_CY, _VP_CZ, _VP_R2 = 1, 2, 3, 4
_VP_B0X, _VP_B0Y, _VP_B0Z = 5, 6, 7
_VP_B1X, _VP_B1Y, _VP_B1Z = 8, 9, 10
_VP_COS, _VP_SIN = 11, 12
_VP_OFFX, _VP_OFFY, _VP_OFFZ = 13, 14, 15
_VP_NID = 16                         # -1/density
_VP_CR, _VP_CG, _VP_CB = 17, 18, 19  # isotropic albedo (solid color)
VP_COLS = 24

_TWO_PI = 6.283185307179586
_LN10_INV = 0.43429448190325176


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m

def _bf16_trunc(x):
    """Truncate x to a bf16-representable value via bit masking.

    NOT `x.astype(bfloat16).astype(float32)`: XLA/Mosaic fold that cast
    round-trip away on the TPU backend (observed on v5e: the K-split and
    split-gather silently degenerated to plain bf16-pass precision, flipping
    ~1.7%% of jumpy's primary hits). Integer masking cannot be folded, and a
    truncated value is exactly representable in bf16, so the DEFAULT matmul
    pass carries it exactly.
    """
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(b & jnp.int32(-65536), jnp.float32)


# --------------------------------------------------------------------------
# In-kernel PCG4D (bit-identical to rng.pcg4d / rng.rand4)
# --------------------------------------------------------------------------

def _pcg4d(x, y, z, w):
    mul = jnp.uint32(1664525)
    add = jnp.uint32(1013904223)
    v0 = x * mul + add
    v1 = y * mul + add
    v2 = z * mul + add
    v3 = w * mul + add
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    v2 = v2 ^ (v2 >> 16)
    v3 = v3 ^ (v3 >> 16)
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    return v0, v1, v2, v3


def _uf(bits):
    """uint32 -> f32 in [0,1), top 24 bits (rng._to_unit_float).

    Mosaic has no uint32->f32 cast; the shifted value fits in 24 bits, so a
    bitcast to int32 (always non-negative) then int32->f32 is exact.
    """
    top24 = jax.lax.bitcast_convert_type(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _rand4(ray_id, depth_u32, salt, seed):
    b0, b1, b2, b3 = _pcg4d(ray_id, depth_u32,
                            jnp.uint32(salt & 0xFFFFFFFF), seed)
    return _uf(b0), _uf(b1), _uf(b2), _uf(b3)


def _unit_vec(u1, u2):
    """Uniform sphere direction (rng.unit_vector_from_uniforms)."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = _TWO_PI * u2
    return r * jnp.cos(phi), r * jnp.sin(phi), z


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------

def _kernel(par_ref, ipar_ref, colrow_ref, rid_ref, *refs,
            width: int, height: int, spp: int, max_depth: int,
            t_min: float, tile_b: int, r_pad: int = 0, r_chunk: int = 0,
            s_pad: int = 0, s_chunk: int = 0,
            has_sph: bool = True, has_planar: bool = False,
            n_vol: int = 0, ablate: str = "",
            defer_tex: bool = False, emit_paths: bool = False,
            primary_clist: bool = False, p_k: int = 0,
            pp_k: int = 0, d0: int = 0, phase_in: bool = False,
            phase_out: bool = False, p_ovf: bool = False,
            pp_ovf: bool = False, sec_clist: bool = False,
            s_sec: bool = False, chunk_ks: bool = False,
            p_stream: bool = False):
    f = jnp.float32
    L = tile_b // 8  # per-ray state is (8, L): full VPU sublane utilization
    # Timing ablations produce wrong output and may not combine with the
    # aux-emitting modes; control tokens (nocull/noclist/notile/nopeel/
    # forcetile) are output-preserving and compose freely.
    assert not (any(t in ablate for t in ("noshade", "nogather"))
                and (defer_tex or emit_paths))
    n_sch = (s_pad // s_chunk) if (has_sph and s_chunk) else 1

    i_ref = 0
    if phase_in:
        # Mid-phase resume: per-lane state from the previous depth phase
        # (stream compaction between phases — SURVEY §5.7). 120 rows =
        # 15 planes x 8 sublanes: o(3) d(3) tp(3) rad(3) time alive seg.
        stin_ref = refs[i_ref]
        i_ref += 1
    if has_sph:
        tab_ref = refs[i_ref]
        tab_int_ref = refs[i_ref + 1]
        i_ref += 2
        if p_k:
            # Peeled-primary per-tile tables: THIS tile's frustum-
            # compacted sphere set (p_k columns), used for the statically
            # unrolled bounce 0 only (host prepass, render_fused wrapper).
            ptab_ref, ptab_int_ref = refs[i_ref:i_ref + 2]
            i_ref += 2
            if p_ovf:
                # (1,1,1) SMEM flag: this tile's frustum set overflowed
                # the K columns — bounce 0 falls back to the full table.
                povf_ref = refs[i_ref]
                i_ref += 1
        if n_sch > 1:
            svab_ref = refs[i_ref]     # (c, 8) SMEM sphere-chunk AABBs
            i_ref += 1
            if s_sec:
                # VMEM twin of the chunk AABBs for the vectorized
                # compacted-walk cull flags (round 6).
                svabv_ref = refs[i_ref]
                i_ref += 1
            elif primary_clist:
                ctab_s_ref = refs[i_ref]
                i_ref += 1
    if has_planar:
        tab_pd_ref, tab_po_ref, tab_pg_ref, vab_ref = refs[i_ref:i_ref + 4]
        i_ref += 4
        if p_stream:
            # Over-cap streaming (VERDICT r4 #9): the three chunk tables
            # above live in HBM (memory_space=ANY); per chunk the cull
            # cond's taken branch DMAs the slab into this VMEM scratch.
            (pd_s_ref, po_s_ref, pg_s_ref,
             sem_pd, sem_po, sem_pg) = refs[-6:]
        if sec_clist:
            # (8, n_chunks) SMEM scratch: per-row compacted chunk-id
            # lists for the condless secondary walk (mutually exclusive
            # with p_stream — host gate).
            clist_ref = refs[-2 if s_sec else -1]
        if pp_k:
            # Peeled-primary per-tile planar tables (K-split single-chunk
            # layout, width pp_k): bounce 0 intersects only THIS tile's
            # frustum-compacted rect/triangle set.
            ptab_pd_ref, ptab_po_ref, ptab_pg_ref = refs[i_ref:i_ref + 3]
            i_ref += 3
            if pp_ovf:
                # (1,1,1) SMEM flag: this tile's frustum set overflowed
                # pp_k columns — bounce 0 additionally walks its full
                # chunk list (trip count 0 for in-budget tiles).
                povfp_ref = refs[i_ref]
                i_ref += 1
        if sec_clist:
            # (C, 8) VMEM twin of the SMEM chunk AABBs: secondary bounces
            # compute all per-row chunk cull flags in one vectorized
            # (C, L) pass and walk a compacted SMEM chunk list with a
            # condless dynamic-trip fori (round 6; see the walk below).
            vabv_ref = refs[i_ref]
            i_ref += 1
        if (primary_clist and r_pad // r_chunk > 1
                and (not sec_clist or pp_ovf)):
            # (1, n_chunks) SMEM row for THIS tile: [count, chunk ids...] —
            # the chunks (excluding the always-processed chunk 0, UNLESS
            # pp_ovf: the peeled primary has no static chunk-0 walk, so
            # overflow lists include it) whose AABB overlaps the tile's
            # primary-ray frustum (host prepass). Unused when the
            # in-kernel compacted walk (sec_clist) covers every bounce.
            ctab_ref = refs[i_ref]
            i_ref += 1
    if s_sec:
        # (1, n_sch) SMEM scratch: tile-level compacted sphere-chunk
        # list. Unpacked OUTSIDE the has_planar block — sphere-only
        # scenes chunk too (n_sch > 1 at >= 1024 columns or forced via
        # RTW_S_CHUNK / s_chunk_override).
        slist_ref = refs[-1]
    if n_vol:
        vp_ref = refs[i_ref]
        i_ref += 1
    rad_ref, seg_ref = refs[i_ref], refs[i_ref + 1]
    i_ref += 2
    if defer_tex:
        # Per-bounce radiance contributions (24 = rgb x 8 sublanes per depth)
        # and deferred-texture records (32 = (a, b, c, code) x 8): noise and
        # image texels are evaluated OUTSIDE the kernel (textures.py, exact
        # staged-path semantics) and recombined as rad = sum_k c_k prod f_j.
        ctb_ref, dfr_ref = refs[i_ref], refs[i_ref + 1]
        i_ref += 2
    if emit_paths:
        # Per-bounce winner codes (fam + 4*idx; 0 = miss/dead) — the VJP
        # residuals consumed by integrator.replay_rays.
        pth_ref = refs[i_ref]
        i_ref += 1
    if phase_out:
        stout_ref = refs[i_ref]
        i_ref += 1

    # All table matmuls run at HIGHEST precision: Mosaic's (and XLA:TPU's)
    # DEFAULT f32 dot is bf16-pass reduced precision, which puts ~1e-2
    # relative noise on the planar NUM/DF/U/V planes — small scanned-mesh
    # triangles then misclassify their in/out edge tests and whole thin
    # strips drop out (the monument's diagonal striping, rounds 2-3; root-
    # caused via interpret-on-TPU == chip != interpret-on-CPU). It also
    # rounds gathered param rows (prim ids > 256 are not bf16-exact).
    _PREC = jax.lax.Precision.HIGHEST

    def P(i):  # camera/background scalar
        return par_ref[0, i]

    n_live = ipar_ref[0, 2]  # lanes in this call (tail lanes are dead)

    # Ray r of this tile sits at (sublane s, lane c) with r = s*L + c; the
    # host lays colrow/rid/outputs out to match. All per-ray vectors are
    # (8, L): measured on v5e, (1, TB)-shaped state ran the VPU at 1/8
    # utilization and the S-independent portion was ~2/3 of the frame
    # (BENCH_NOTES.md). The global lane id is LOADED, not an iota: under
    # 2D-tiled ray order (render_fused block_tiling) position and lane id
    # decouple, and the loaded id keys the RNG so the per-lane image is
    # bitwise independent of the assignment.
    lane = rid_ref[0:8, :]
    rid = jax.lax.bitcast_convert_type(lane, jnp.uint32)
    # Mosaic only bitcasts vectors: broadcast the scalar seed first (via the
    # concrete-layout iota, not jnp.zeros — see bounce_state note).
    seed = jax.lax.bitcast_convert_type(lane * 0 + ipar_ref[0, 1], jnp.uint32)
    zero_u = jax.lax.bitcast_convert_type(lane * 0, jnp.uint32)

    if phase_in:
        ox = stin_ref[0:8, :]
        oy = stin_ref[8:16, :]
        oz = stin_ref[16:24, :]
        dx = stin_ref[24:32, :]
        dy = stin_ref[32:40, :]
        dz = stin_ref[40:48, :]
        tp0r = stin_ref[48:56, :]
        tp0g = stin_ref[56:64, :]
        tp0b = stin_ref[64:72, :]
        rd0r = stin_ref[72:80, :]
        rd0g = stin_ref[80:88, :]
        rd0b = stin_ref[88:96, :]
        time = stin_ref[96:104, :]
        alive0 = stin_ref[104:112, :]
        seg0 = stin_ref[112:120, :]
    else:
        in_chunk = lane < (ipar_ref[0, 0] + n_live)

        # ---- primary rays (integrator._pixel_rays + camera.get_rays) ------
        # col/row are precomputed host-side: Mosaic's int-div-by-constant
        # lowering needs i64 truncation it doesn't support.
        col = colrow_ref[0:8, :]
        row = colrow_ref[8:16, :]

        j0, j1, _, _ = _rand4(rid, zero_u, rt_rng.SALT_PIXEL_JITTER, seed)
        sx = (col + j0) / f(width - 1)
        tx = (row + j1) / f(height - 1)

        l0, l1, _, _ = _rand4(rid, zero_u, rt_rng.SALT_LENS, seed)
        lrad = jnp.sqrt(l0)
        lphi = _TWO_PI * l1
        rdx = P(18) * lrad * jnp.cos(lphi)   # lens_radius * disk sample
        rdy = P(18) * lrad * jnp.sin(lphi)

        u0, _, _, _ = _rand4(rid, zero_u, rt_rng.SALT_TIME, seed)
        time = P(19) + u0 * P(20)          # time0 + U * (time1 - time0)

        offx = P(12) * rdx + P(15) * rdy   # cam.u * rd.x + cam.v * rd.y
        offy = P(13) * rdx + P(16) * rdy
        offz = P(14) * rdx + P(17) * rdy

        ox = P(0) + offx
        oy = P(1) + offy
        oz = P(2) + offz
        dx = P(3) + sx * P(6) + tx * P(9) - P(0) - offx
        dy = P(4) + sx * P(7) + tx * P(10) - P(1) - offy
        dz = P(5) + sx * P(8) + tx * P(11) - P(2) - offz

    bg_r, bg_g, bg_b = P(21), P(22), P(23)

    # Loop-invariant per-lane feature rows for the c_term matmul.
    # Derive the 0/1 init vectors from loaded data, not jnp.zeros/ones:
    # broadcast constants carry a replicated layout that Mosaic cannot
    # reconcile with concrete loop-carried layouts ("Sublane broadcast").
    zero_f = time * 0.0
    one_f = zero_f + 1.0
    time2 = time * time

    def bounce_state():
        # `alive`/`seg` are carried as f32 0/1 masks and counts: Mosaic
        # rejects i1 vectors in loop carries and bool<->number casts.
        if phase_in:
            return (jnp.int32(0), ox, oy, oz, dx, dy, dz,
                    tp0r, tp0g, tp0b, rd0r, rd0g, rd0b,
                    jnp.where(alive0 > 0.0, one_f, zero_f), seg0)
        return (jnp.int32(0), ox, oy, oz, dx, dy, dz,
                one_f, one_f, one_f,
                zero_f, zero_f, zero_f,
                jnp.where(in_chunk, one_f, zero_f), zero_f)

    def cond(st):
        i, *_, alive_m, _seg = st
        return (i < max_depth) & (jnp.max(alive_m) > 0.0)

    def body(st, primary: bool = False):
        (i, ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr_, rg_, rb_,
         alive_m, seg) = st
        alive = alive_m > 0.0
        seg = seg + alive_m
        # d0 offsets the RNG depth key in mid phases (stream compaction).
        depth_u = jax.lax.bitcast_convert_type(lane * 0 + i + d0,
                                               jnp.uint32)

        # -- intersection: quadratic coefficients on the MXU ----------------
        # half_b = o.d - d.c(time);  c_term = |o - c(time)|^2 - r^2, with
        # c(time) = alpha + time*beta affine in the per-lane shutter time.
        # One matmul + plane pipeline per sublane row s (8 total, identical
        # summed MXU/VPU work to one (S, 8L) plane, 1/8 the live VMEM):
        # planes are (S, L) — spheres on sublanes, rays on lanes — so per-ray
        # scalars broadcast along sublanes and the winner reduction is a
        # sublane max; the 8 per-row results restack into (8, L) state.
        a = dx * dx + dy * dy + dz * dz          # (8, L)
        o_dot_d = ox * dx + oy * dy + oz * dz    # (8, L)
        o_sq = ox * ox + oy * oy + oz * oz       # (8, L)
        neg_tmin_a = f(-t_min) * a
        txd, tyd, tzd = time * dx, time * dy, time * dz
        txo, tyo, tzo = time * ox, time * oy, time * oz

        def _split(v):  # hi/mid/lo thirds for the K-split intersections
            h = _bf16_trunc(v)
            m = _bf16_trunc(v - h)
            return h, m, v - h - m

        dn = (((0,), (0,)), ((), ()))  # contract the feature axis
        dng = (((1,), (0,)), ((), ()))  # contract the S axis
        tn_rows, param_rows, sph_fns = [], [], []
        for s in range(8):
            def R(v, s=s):                     # s pinned: R is also called
                return v[s:s + 1, :]           # from the post-loop chunk
                                               # fori via sph_fns

            if has_sph:
                # K-SPLIT intersection matmuls at DEFAULT precision: the
                # coefficient table carries [Th; Tl; Th] blocks and the
                # feature vector [Fh; Fh; Fl] (hi = f32(bf16(x)), lo =
                # x - hi), so one bf16-pass dot accumulates Th*Fh + Tl*Fh
                # + Th*Fl in the f32 accumulator — ~2^-17-accurate
                # products at single-pass cost (K quadruples but still
                # pads to the same 128 lanes). DEFAULT on the raw
                # coefficients produced 27% bogus segments (wrong hit
                # structure, round-3 root cause); HIGHEST fixed it at 6x
                # the MXU passes.
                s1 = [_split(R(v)) for v in (dx, dy, dz, txd, tyd, tzd,
                                             o_dot_d)]
                s2 = [_split(R(v)) for v in (ox, oy, oz, txo, tyo, tzo,
                                             one_f, time, time2, o_sq)]

                def blocks(sp, pads):
                    # Table blocks [Th Th Th Tm Tm Tm Tl Tl] pair with
                    # feature blocks [Fh Fm Fl Fh Fm Fl Fh Fm].
                    hs = [h for h, _, _ in sp]
                    ms = [m for _, m, _ in sp]
                    ls = [lo for _, _, lo in sp]
                    rows = hs + ms + ls + hs + ms + ls + hs + ms
                    return jnp.concatenate(rows + [R(zero_f)] * pads,
                                           axis=0)
                f1 = blocks(s1, 8)                                 # (64, L)
                f2 = blocks(s2, 0)                                 # (80, L)

                def sphere_chunk(ti, tg, f1=f1, f2=f2, R=R):
                    # (f1/f2/R bound by default args: these fns are called
                    # from the tile-level chunk fori AFTER this loop, where
                    # a late-bound closure would pin every row to s == 7.)
                    # ti (144, sc) K-split table block; tg (2P, sc) gather
                    # blocks. Returns (chunk-best -t*a (1, L), gathered
                    # winner params (2P, L) or None under 'nogather').
                    m1 = jax.lax.dot_general(ti[0:64, :], f1, dn,
                                             preferred_element_type=f)
                    c_term = jax.lax.dot_general(ti[64:144, :], f2, dn,
                                                 preferred_element_type=f)
                    disc = m1 * m1 - R(a) * c_term              # (sc, L)
                    # No explicit disc>0 guard: sqrt(neg) = NaN, NaN
                    # comparisons are false, so misses fall through to
                    # -BIG naturally (tangent disc==0 now counts as a hit
                    # — measure zero).
                    sqrtd = jnp.sqrt(disc)
                    # Scaled-root domain: root_k = -p_k / a with a > 0, so
                    # compares and the nearest-hit reduction run on p_k
                    # directly (no divides): root >= t_min <=> p <=
                    # -t_min*a; min_t <=> max_p. Near root p1 = sqrtd - m1
                    # is valid iff sqrtd <= m1 + nta; select on sqrtd
                    # before the shared -m1 (one plane op fewer than
                    # forming both p1 and p2).
                    nta = R(neg_tmin_a)
                    ssel = jnp.where(sqrtd <= m1 + nta, sqrtd, -sqrtd)
                    sel = ssel - m1
                    tn_all = jnp.where(sel <= nta, sel, f(-_BIG))  # (sc, L)
                    tn_s = jnp.max(tn_all, axis=0, keepdims=True)  # (1, L)
                    if "nogather" in ablate:
                        return tn_s, None
                    # Miss guard only when chunked: the cross-chunk
                    # select needs an all-miss chunk to contribute exact
                    # zeros. Single-chunk skips the guard — an all-miss
                    # lane matches every column and gathers finite
                    # garbage, which hit/alive masks out — saving one
                    # (sc, L) op in the hot pipeline.
                    if n_sch > 1:
                        ohmask = (tn_all == tn_s) & (tn_s > f(-1.0e37))
                    else:
                        ohmask = tn_all == tn_s
                    onehot = jnp.where(ohmask, f(1.0), f(0.0))     # (sc, L)
                    # SPLIT gather at DEFAULT (bf16-pass) precision: rows
                    # [0, P) hold hi = f32(bf16(x)) (bf16-exact, so the
                    # pass carries them exactly), rows [P, 2P) the
                    # residuals x - hi; summing the two gathered blocks
                    # reconstructs x to ~8e-6 relative at 1/3 the cost of
                    # a HIGHEST gather. The intersection matmuls above
                    # stay K-split: DEFAULT there produced 27%% bogus
                    # segments (wrong hit structure, round-3 root cause).
                    p_c = jax.lax.dot_general(tg[0:2 * P_ROWS, :], onehot,
                                              dng,
                                              preferred_element_type=f)
                    return tn_s, p_c                               # (2P, L)

                sph_fns.append(sphere_chunk)
                use_ovf = (primary and p_k and p_ovf
                           and "nogather" not in ablate)
                if use_ovf:
                    continue        # rows computed post-loop (one cond)
                if primary and p_k:
                    # Peeled bounce 0: intersect only THIS tile's
                    # frustum-compacted sphere set (p_k columns instead
                    # of s_pad) — conservative host prepass, so the
                    # winner matches the full-table search exactly.
                    best = sphere_chunk(ptab_int_ref[0:144, :],
                                        ptab_ref[0:2 * P_ROWS, :])
                else:
                    best = sphere_chunk(tab_int_ref[0:144, :],
                                        tab_ref[0:2 * P_ROWS, :])
                tn_rows.append(best[0])
                if "nogather" not in ablate:
                    param_rows.append(best[1])

        if has_sph and primary and p_k and p_ovf \
                and "nogather" not in ablate:
            # K-128 peel with per-tile overflow: almost every tile's
            # frustum set fits 128 columns (jumpy: 703/704, median 5);
            # the rare overflowing tile intersects the full table via
            # ONE lax.cond around the whole 8-row block (straight-line
            # code — the one-cond-per-fori-body compile constraint
            # applies to loop bodies).
            def _peel_rows(_):
                outs = []
                for s in range(8):
                    tn, pr = sph_fns[s](ptab_int_ref[0:144, :],
                                        ptab_ref[0:2 * P_ROWS, :])
                    outs += [tn, pr]
                return tuple(outs)

            def _full_rows(_):
                outs = []
                for s in range(8):
                    tn, pr = sph_fns[s](tab_int_ref[0:144, :],
                                        tab_ref[0:2 * P_ROWS, :])
                    outs += [tn, pr]
                return tuple(outs)

            flat = jax.lax.cond(povf_ref[0, 0, 0] > 0, _full_rows,
                                _peel_rows, 0)
            tn_rows = list(flat[0::2])
            param_rows = list(flat[1::2])

        if has_sph and n_sch > 1 and not (primary and p_k):
            # Chunked sphere walk. Chunk 0 is walked statically above
            # (its outputs give the carries their concrete layouts).
            sivx = 1.0 / dx                               # (8, L)
            sivy = 1.0 / dy
            sivz = 1.0 / dz

            def s_heavy_at(cI, carry):
                tns, ps = carry
                ti = tab_int_ref[pl.ds(cI * 144, 144), :]
                tg = tab_ref[pl.ds(cI * 2 * P_ROWS, 2 * P_ROWS), :]
                new_tn, new_p = [], []
                for s in range(8):
                    trn, p_c = sph_fns[s](ti, tg)
                    if "nogather" in ablate:
                        new_tn.append(jnp.maximum(trn, tns[s]))
                        continue
                    b = jnp.where(trn > tns[s], f(1.0), f(0.0))
                    # Exact select (not a lerp) — see the planar
                    # walk's winner-blend comment.
                    new_tn.append(jnp.maximum(trn, tns[s]))
                    new_p.append(ps[s] * (1.0 - b) + p_c * b)
                return tuple(new_tn), tuple(new_p)

            carry0 = (tuple(tn_rows), tuple(param_rows))
            if s_sec:
                # Compacted condless sphere-chunk walk (round 6; same
                # scheme as the planar sec_clist walk below): vectorized
                # per-row cull flags OR-ed across rows into a tile-level
                # compacted SMEM chunk list, walked by a dynamic-trip
                # fori with no cond in the body. book2's 1006-sphere
                # cluster is spatially compact (Morton chunks), so rays
                # not crossing it skip all 8 of its 128-wide chunks.
                btn8 = jnp.concatenate(tn_rows, axis=0)   # (8, L)
                tcur = jnp.where(btn8 > f(-1.0e37), -btn8 / a, f(_BIG))
                Cs = n_sch - 1
                scnt = jnp.int32(0)
                flags = []
                for s in range(8):
                    def scol(j, n=Cs):
                        return svabv_ref[pl.ds(1, n), j:j + 1]

                    bx0 = (scol(0) - ox[s:s + 1]) * sivx[s:s + 1]
                    bx1 = (scol(3) - ox[s:s + 1]) * sivx[s:s + 1]
                    by0 = (scol(1) - oy[s:s + 1]) * sivy[s:s + 1]
                    by1 = (scol(4) - oy[s:s + 1]) * sivy[s:s + 1]
                    bz0 = (scol(2) - oz[s:s + 1]) * sivz[s:s + 1]
                    bz1 = (scol(5) - oz[s:s + 1]) * sivz[s:s + 1]
                    en = jnp.maximum(jnp.maximum(jnp.minimum(bx0, bx1),
                                                 jnp.minimum(by0, by1)),
                                     jnp.minimum(bz0, bz1))
                    ex = jnp.minimum(jnp.minimum(jnp.maximum(bx0, bx1),
                                                 jnp.maximum(by0, by1)),
                                     jnp.maximum(bz0, bz1))
                    may = ((en <= ex) & (ex >= f(t_min))
                           & (alive_m[s:s + 1] > 0.0)
                           & (en < tcur[s:s + 1]))
                    flags.append(jnp.where(may, f(1.0), f(0.0)))
                mayf_t = flags[0]
                for s in range(1, 8):
                    mayf_t = jnp.maximum(mayf_t, flags[s])  # (Cs, L)
                # U-way unrolled walk: U chunks per fori iteration divides
                # the per-iteration pipeline-drain cost (book2 measured
                # ~350K cycles per tile-bounce across ~27 serialized
                # 1-chunk iterations). Pad slots are pre-filled with chunk
                # id 0 — already processed statically, and the strict->
                # winner select makes re-scoring a chunk an exact no-op.
                SU = 2 if Cs >= 4 else 1
                WS = _round_up(Cs, SU) + SU
                for c in range(WS):
                    slist_ref[0, c] = jnp.int32(0)
                for c in range(Cs):
                    fl = jnp.max(mayf_t[c:c + 1, :]) > 0.0
                    idx = jnp.where(fl, scnt, jnp.int32(WS - 1))
                    slist_ref[0, idx] = jnp.int32(c + 1)
                    scnt = scnt + jnp.where(fl, jnp.int32(1),
                                            jnp.int32(0))

                def s_cl_body(cK, carry):
                    for u in range(SU):
                        carry = s_heavy_at(slist_ref[0, cK * SU + u],
                                           carry)
                    return carry

                carry = jax.lax.fori_loop(0, (scnt + SU - 1) // SU,
                                          s_cl_body, carry0)
            else:
                # Cond-based walk (round 4): ONE tile-level fori with all
                # 8 sublane rows per iteration and a single chunk-level
                # cull cond. (8 per-row fori_loops with their own conds
                # measured 37M vs 89M unchunked on jumpy — lax control
                # flow serializes what Mosaic pipelines straight-line.)
                def s_chunk_body(cK, carry):
                    if primary_clist:
                        cI = jnp.where(i == 0, ctab_s_ref[0, 0, 1 + cK],
                                       cK + 1)
                    else:
                        cI = cK

                    def s_heavy(carry):
                        return s_heavy_at(cI, carry)

                    if "nocull" in ablate:
                        return s_heavy(carry)
                    bx0 = (svab_ref[cI, 0] - ox) * sivx       # (8, L)
                    bx1 = (svab_ref[cI, 3] - ox) * sivx
                    by0 = (svab_ref[cI, 1] - oy) * sivy
                    by1 = (svab_ref[cI, 4] - oy) * sivy
                    bz0 = (svab_ref[cI, 2] - oz) * sivz
                    bz1 = (svab_ref[cI, 5] - oz) * sivz
                    en = jnp.maximum(jnp.maximum(jnp.minimum(bx0, bx1),
                                                 jnp.minimum(by0, by1)),
                                     jnp.minimum(bz0, bz1))
                    ex = jnp.minimum(jnp.minimum(jnp.maximum(bx0, bx1),
                                                 jnp.maximum(by0, by1)),
                                     jnp.maximum(bz0, bz1))
                    # Chunk matters only for a live lane whose ray crosses
                    # the box past t_min and before its current best
                    # (p = -t*a domain: t = -btn/a).
                    btn8 = jnp.concatenate(carry[0], axis=0)  # (8, L)
                    tcur = jnp.where(btn8 > f(-1.0e37), -btn8 / a,
                                     f(_BIG))
                    may = ((en <= ex) & (ex >= f(t_min))
                           & (alive_m > 0.0) & (en < tcur))
                    mayf = jnp.where(may, f(1.0), f(0.0))
                    return jax.lax.cond(jnp.max(mayf) > 0.0, s_heavy,
                                        lambda c: c, carry)

                if primary_clist:
                    s_count = jnp.where(i == 0, ctab_s_ref[0, 0, 0],
                                        jnp.int32(n_sch - 1))
                    carry = jax.lax.fori_loop(0, s_count, s_chunk_body,
                                              carry0)
                else:
                    carry = jax.lax.fori_loop(1, n_sch, s_chunk_body,
                                              carry0)
            tn_rows = list(carry[0])
            param_rows = list(carry[1])

        def _stack(rows):
            return jnp.concatenate(rows, axis=0)                  # (8, L)

        if has_planar:
            # Planar planes (rects + triangles): t = NUM/DF,
            # u = U0 + t*U1, v = V0 + t*V1 (see table layout above). The
            # primitive axis is processed in chunks of r_chunk so the live
            # plane set stays VMEM-bounded for mesh-scale scenes; ONE
            # fori_loop per bounce walks the chunks with all 8 sublane rows
            # inside and a single chunk-level AABB cull branch. (Round 2 ran
            # 8 independent per-row fori_loops, each with its own lax.cond —
            # 8x the branches and scalar reductions for the same flops;
            # BENCH_NOTES round-2 table.)
            rc = r_chunk
            n_chunks = r_pad // rc
            # Single-chunk planar scenes (rect rooms etc.) get the same
            # 8-block K-split as the sphere path: f32-quality products from
            # ONE DEFAULT-precision pass. Chunked mesh scenes keep HIGHEST
            # (the K-split tables triple the per-prim VMEM footprint, which
            # the fully-resident mesh tables cannot afford).
            pk = n_chunks == 1

            def _krows(sp):
                hs = [h for h, _, _ in sp]
                ms = [m for _, m, _ in sp]
                ls = [lo for _, _, lo in sp]
                return hs + ms + ls + hs + ms + ls + hs + ms

            # The peeled primary bounce runs K-split DEFAULT tables even in
            # chunked-mesh scenes (the peel block is single-chunk-shaped),
            # so both feature layouts may be needed in one instantiation.
            need_ks = pk or chunk_ks or (primary and pp_k > 0)
            if need_ks:
                fd_ks = [jnp.concatenate(
                    _krows([_split(v[s:s + 1]) for v in (dx, dy, dz)]),
                    axis=0) for s in range(8)]                   # (24, L)
                fo_ks = [jnp.concatenate(
                    _krows([_split(v[s:s + 1])
                            for v in (ox, oy, oz, one_f)]),
                    axis=0) for s in range(8)]                   # (32, L)
            if not pk and (not chunk_ks or p_stream):
                fd_raw = [jnp.concatenate([dx[s:s + 1], dy[s:s + 1],
                                           dz[s:s + 1]], axis=0)
                          for s in range(8)]
                fo_raw = [jnp.concatenate([ox[s:s + 1], oy[s:s + 1],
                                           oz[s:s + 1], one_f[s:s + 1]],
                                          axis=0)
                          for s in range(8)]

            def planar_chunk(pd8, po8, pg, s, rc=rc, pk=pk or chunk_ks):
                # pd8 (8|24, 3rc); po8 (8|32, 4rc) — K-split when pk.
                if pk:
                    md = jax.lax.dot_general(pd8[0:24], fd_ks[s], dn,
                                             preferred_element_type=f)
                    mo = jax.lax.dot_general(po8[0:32], fo_ks[s], dn,
                                             preferred_element_type=f)
                else:
                    md = jax.lax.dot_general(pd8[0:3], fd_raw[s], dn,
                                             precision=_PREC,
                                             preferred_element_type=f)
                    mo = jax.lax.dot_general(po8[0:4], fo_raw[s], dn,
                                             precision=_PREC,
                                             preferred_element_type=f)
                df = md[0:rc]
                t_rp = mo[0:rc] / df                          # (rc, L)
                u = mo[rc:2 * rc] + t_rp * md[rc:2 * rc]
                v = mo[2 * rc:3 * rc] + t_rp * md[2 * rc:3 * rc]
                flag = mo[3 * rc:]        # 1 = triangle bound, 0 = rect
                # Padded slots give t = 0/0 = NaN; NaN compares false.
                ok = ((t_rp >= f(t_min)) & (u >= 0.0) & (v >= 0.0)
                      & (v <= 1.0) & (u + flag * v <= 1.0))
                tneg = jnp.where(ok, -t_rp, f(-_BIG))
                trn = jnp.max(tneg, axis=0, keepdims=True)    # (1, L)
                # Keep the miss guard here (unlike the sphere onehot):
                # the cross-chunk exact select below needs a lost/all-miss
                # chunk to contribute exact zeros.
                ohr = jnp.where((tneg == trn) & (trn > f(-1.0e37)),
                                f(1.0), f(0.0))
                if "nogather" not in ablate:
                    p_c = jax.lax.dot_general(
                        pg[0:2 * PG_ROWS], ohr, dng,
                        preferred_element_type=f)             # (2PG, L)
                    # Winner's in-plane coordinates (normal/UV interp).
                    # Sanitize through `ok` first: padded slots carry
                    # u = NaN (0/0 t), and 0 * NaN = NaN would poison
                    # the one-hot reduction.
                    u_c = jnp.sum(ohr * jnp.where(ok, u, f(0.0)),
                                  axis=0, keepdims=True)
                    v_c = jnp.sum(ohr * jnp.where(ok, v, f(0.0)),
                                  axis=0, keepdims=True)
                else:
                    p_c = u_c = v_c = None
                return trn, p_c, u_c, v_c

            # Per-row chunk walks: one fori_loop per sublane row, ONE
            # lax.cond per loop body. The round-3 restructure attempts that
            # put several conds in one loop body (a chunk-level pre-skip
            # cond nested over 8 per-row conds, or 8 flat per-row conds in
            # one fori) both HANG the TPU compile helper (>15 min, killed;
            # the single-cond variants compile in 9-21 s) — and the A/B
            # showed cull RESOLUTION dominates branch count anyway
            # (chunk-level-only cull: 10.0M seg/s on cow vs per-row 15.5M).
            cull = "nocull" not in ablate

            def _stream_walk():
                """HBM-streamed chunk walk (p_stream): one tile-level fori
                over ALL chunks; the single chunk-level cull cond's taken
                branch DMAs the chunk's three table slabs from HBM into
                VMEM scratch and intersects all 8 sublane rows. Coarser
                cull resolution than the per-row walk (measured ~1.5x on
                cow-class scenes) — the goal is beating the ~30x staged
                cliff for scenes past the VMEM-resident table caps, not
                matching the resident path."""
                ivx8 = 1.0 / dx
                ivy8 = 1.0 / dy
                ivz8 = 1.0 / dz
                # Loop-carry zeros derived from loaded data (a fresh
                # jnp.zeros constant entering a carry trips Mosaic's
                # "Sublane broadcast").
                z2pg = jnp.concatenate([zero_f] * (2 * PG_ROWS // 8),
                                       axis=0)                 # (2PG, L)
                init = (zero_f - f(_BIG), tuple([z2pg] * 8), zero_f,
                        zero_f)

                def stream_body(cK, carry):
                    btrn8 = carry[0]
                    bx0 = (vab_ref[cK, 0] - ox) * ivx8
                    bx1 = (vab_ref[cK, 3] - ox) * ivx8
                    by0 = (vab_ref[cK, 1] - oy) * ivy8
                    by1 = (vab_ref[cK, 4] - oy) * ivy8
                    bz0 = (vab_ref[cK, 2] - oz) * ivz8
                    bz1 = (vab_ref[cK, 5] - oz) * ivz8
                    en = jnp.maximum(
                        jnp.maximum(jnp.minimum(bx0, bx1),
                                    jnp.minimum(by0, by1)),
                        jnp.minimum(bz0, bz1))
                    ex = jnp.minimum(
                        jnp.minimum(jnp.maximum(bx0, bx1),
                                    jnp.maximum(by0, by1)),
                        jnp.maximum(bz0, bz1))
                    may = ((en <= ex) & (ex >= f(t_min))
                           & (alive_m > 0.0) & (en < -btrn8))
                    mayf = jnp.where(may, f(1.0), f(0.0))

                    def heavy(carry):
                        btrn8, bps, bu8, bv8 = carry
                        c1 = pltpu.make_async_copy(
                            tab_pd_ref.at[pl.ds(cK * 8, 8), :],
                            pd_s_ref, sem_pd)
                        c2 = pltpu.make_async_copy(
                            tab_po_ref.at[pl.ds(cK * 8, 8), :],
                            po_s_ref, sem_po)
                        c3 = pltpu.make_async_copy(
                            tab_pg_ref.at[pl.ds(cK * 2 * PG_ROWS,
                                                2 * PG_ROWS), :],
                            pg_s_ref, sem_pg)
                        c1.start()
                        c2.start()
                        c3.start()
                        c1.wait()
                        c2.wait()
                        c3.wait()
                        tr_l, bp_l, bu_l, bv_l = [], [], [], []
                        for s in range(8):
                            trn, p_c, u_c, v_c = planar_chunk(
                                pd_s_ref[0:8, :], po_s_ref[0:8, :],
                                pg_s_ref[0:2 * PG_ROWS, :], s)
                            bt = btrn8[s:s + 1, :]
                            b = jnp.where(trn > bt, f(1.0), f(0.0))
                            nb = 1.0 - b
                            tr_l.append(jnp.maximum(trn, bt))
                            bp_l.append(bps[s] * nb + p_c * b)
                            bu_l.append(bu8[s:s + 1, :] * nb + u_c * b)
                            bv_l.append(bv8[s:s + 1, :] * nb + v_c * b)
                        return (_stack(tr_l), tuple(bp_l), _stack(bu_l),
                                _stack(bv_l))

                    return jax.lax.cond(jnp.max(mayf) > 0.0, heavy,
                                        lambda c: c, carry)

                btrn8, bps, bu8, bv8 = jax.lax.fori_loop(
                    0, n_chunks, stream_body, init)
                return btrn8, list(bps), bu8, bv8

            tr_rows, paramr_list, uw_rows, vw_rows = [], [], [], []
            pd_rows0 = 24 if (pk or chunk_ks) else 8
            po_rows0 = 32 if (pk or chunk_ks) else 8
            cprow = 24 if chunk_ks else 8
            cporow = 32 if chunk_ks else 8
            peel_planar = primary and pp_k > 0
            for s in ([] if p_stream else range(8)):
                if peel_planar:
                    # Peeled bounce 0: ONE K-split DEFAULT-precision chunk
                    # over the tile's frustum-compacted planar set (pp_k
                    # wide) — no chunk walk, no cull branches, no
                    # serialized per-chunk matmul latency (the round-6 cow
                    # profile: the chunked walk costs ~2K cycles per fori
                    # iteration, latency- not work-bound). The ~5% of
                    # tiles whose frustum set overflows pp_k columns rerun
                    # the full chunked walk below (trip count 0 for
                    # everyone else); the winner select is a max, so
                    # re-scoring the peeled prims is idempotent.
                    best = planar_chunk(ptab_pd_ref[0:24, :],
                                        ptab_po_ref[0:32, :],
                                        ptab_pg_ref[0:2 * PG_ROWS, :], s,
                                        rc=pp_k, pk=True)
                    if pp_ovf:
                        ivx = 1.0 / dx[s:s + 1]
                        ivy = 1.0 / dy[s:s + 1]
                        ivz = 1.0 / dz[s:s + 1]
                        oxr = ox[s:s + 1]
                        oyr = oy[s:s + 1]
                        ozr = oz[s:s + 1]
                        alive_r = alive_m[s:s + 1]

                        def ovf_body(cK, carry, s=s, ivx=ivx, ivy=ivy,
                                     ivz=ivz, oxr=oxr, oyr=oyr, ozr=ozr,
                                     alive_r=alive_r):
                            btrn, bp, bu, bv = carry
                            # Overflow ctab lists INCLUDE chunk 0 (no
                            # static chunk-0 walk in the peeled primary).
                            cI = ctab_ref[0, 0, 1 + cK]

                            def row_heavy(carry):
                                btrn, bp, bu, bv = carry
                                trn, p_c, u_c, v_c = planar_chunk(
                                    tab_pd_ref[pl.ds(cI * cprow, cprow), :],
                                    tab_po_ref[pl.ds(cI * cporow,
                                                     cporow), :],
                                    tab_pg_ref[pl.ds(cI * 2 * PG_ROWS,
                                                     2 * PG_ROWS), :],
                                    s)
                                b = jnp.where(trn > btrn, f(1.0), f(0.0))
                                nb = 1.0 - b
                                return (jnp.maximum(trn, btrn),
                                        bp * nb + p_c * b,
                                        bu * nb + u_c * b,
                                        bv * nb + v_c * b)

                            bx0 = (vab_ref[cI, 0] - oxr) * ivx
                            bx1 = (vab_ref[cI, 3] - oxr) * ivx
                            by0 = (vab_ref[cI, 1] - oyr) * ivy
                            by1 = (vab_ref[cI, 4] - oyr) * ivy
                            bz0 = (vab_ref[cI, 2] - ozr) * ivz
                            bz1 = (vab_ref[cI, 5] - ozr) * ivz
                            en = jnp.maximum(
                                jnp.maximum(jnp.minimum(bx0, bx1),
                                            jnp.minimum(by0, by1)),
                                jnp.minimum(bz0, bz1))
                            ex = jnp.minimum(
                                jnp.maximum(bx0, bx1),
                                jnp.minimum(jnp.maximum(by0, by1),
                                            jnp.maximum(bz0, bz1)))
                            may = ((en <= ex) & (ex >= f(t_min))
                                   & (alive_r > 0.0) & (en < -btrn))
                            mayf = jnp.where(may, f(1.0), f(0.0))
                            return jax.lax.cond(jnp.max(mayf) > 0.0,
                                                row_heavy, lambda c: c,
                                                carry)

                        trip = jnp.where(povfp_ref[0, 0, 0] > 0,
                                         ctab_ref[0, 0, 0], jnp.int32(0))
                        best = jax.lax.fori_loop(0, trip, ovf_body, best)
                    tr_rows.append(best[0])
                    paramr_list.append(best[1])
                    uw_rows.append(best[2])
                    vw_rows.append(best[3])
                    continue
                best = planar_chunk(tab_pd_ref[0:pd_rows0, :],
                                    tab_po_ref[0:po_rows0, :],
                                    tab_pg_ref[0:2 * PG_ROWS, :], s)
                # Chunk 0 statically (its outputs give the loop carries
                # their concrete layouts); remaining chunks in a fori_loop
                # with dynamic 8-aligned sublane slices, so the unrolled
                # code size is O(1) in scene size (static unrolling of
                # c >= ~5 chunk bodies crashes the compile helper —
                # tools/perf_r2{d,e}.py).
                if sec_clist and n_chunks > 1 and "nogather" not in ablate:
                    # Compacted condless chunk walk (round 6): the cond-
                    # based walk costs ~2K cycles per fori iteration on
                    # v5e (tiny-K HIGHEST matmuls + cond sync serialize;
                    # cow d1-nogather walks all 46 chunks in 531 ms).
                    # Instead: (1) one vectorized (C-1, L) slab test
                    # computes every chunk's per-row cull flag straight-
                    # line (pipelined); (2) flagged chunk ids compact into
                    # an SMEM list via dynamic scalar stores; (3) a fori
                    # with trip count = list length walks ONLY those
                    # chunks, no cond in the body. Dead rows get trip 0.
                    ivx = 1.0 / dx[s:s + 1]
                    ivy = 1.0 / dy[s:s + 1]
                    ivz = 1.0 / dz[s:s + 1]
                    oxr = ox[s:s + 1]
                    oyr = oy[s:s + 1]
                    ozr = oz[s:s + 1]
                    alive_r = alive_m[s:s + 1]
                    Cm1 = n_chunks - 1

                    def vcol(j, n=Cm1):
                        return vabv_ref[pl.ds(1, n), j:j + 1]  # (C-1, 1)

                    bx0 = (vcol(0) - oxr) * ivx               # (C-1, L)
                    bx1 = (vcol(3) - oxr) * ivx
                    by0 = (vcol(1) - oyr) * ivy
                    by1 = (vcol(4) - oyr) * ivy
                    bz0 = (vcol(2) - ozr) * ivz
                    bz1 = (vcol(5) - ozr) * ivz
                    en = jnp.maximum(jnp.maximum(jnp.minimum(bx0, bx1),
                                                 jnp.minimum(by0, by1)),
                                     jnp.minimum(bz0, bz1))
                    ex = jnp.minimum(jnp.minimum(jnp.maximum(bx0, bx1),
                                                 jnp.maximum(by0, by1)),
                                     jnp.maximum(bz0, bz1))
                    may = ((en <= ex) & (ex >= f(t_min))
                           & (alive_r > 0.0) & (en < -best[0]))
                    mayf = jnp.where(may, f(1.0), f(0.0))
                    # U-way unrolled walk (see the sphere walk comment):
                    # pad slots pre-filled with chunk 0 — its re-score is
                    # an exact no-op under the strict-> winner select.
                    PU = 4 if Cm1 >= 8 else 1
                    WP = _round_up(Cm1, PU) + PU
                    cnt = jnp.int32(0)
                    for c in range(WP):
                        clist_ref[s, c] = jnp.int32(0)
                    for c in range(Cm1):
                        fl = jnp.max(mayf[c:c + 1, :]) > 0.0
                        idx = jnp.where(fl, cnt, jnp.int32(WP - 1))
                        clist_ref[s, idx] = jnp.int32(c + 1)
                        cnt = cnt + jnp.where(fl, jnp.int32(1),
                                              jnp.int32(0))

                    def cl_one(cI, carry, s=s):
                        btrn, bp, bu, bv = carry
                        trn, p_c, u_c, v_c = planar_chunk(
                            tab_pd_ref[pl.ds(cI * cprow, cprow), :],
                            tab_po_ref[pl.ds(cI * cporow, cporow), :],
                            tab_pg_ref[pl.ds(cI * 2 * PG_ROWS,
                                             2 * PG_ROWS), :],
                            s)
                        b = jnp.where(trn > btrn, f(1.0), f(0.0))
                        nb = 1.0 - b
                        return (jnp.maximum(trn, btrn),
                                bp * nb + p_c * b,
                                bu * nb + u_c * b,
                                bv * nb + v_c * b)

                    def cl_body(cK, carry, s=s):
                        for u in range(PU):
                            carry = cl_one(clist_ref[s, cK * PU + u],
                                           carry)
                        return carry

                    best = jax.lax.fori_loop(0, (cnt + PU - 1) // PU,
                                             cl_body, best)
                elif n_chunks > 1 and "nogather" not in ablate:
                    # Per-chunk AABB cull (the megakernel's take on
                    # bvh.rs:101-120): Morton-ordered chunks are spatially
                    # compact, so a ~20-op (1, L) slab test on this row's
                    # 128 rays skips the chunk body when no live ray can
                    # improve in it. Block tiling (render_fused) makes the
                    # row's rays a ~4x2-pixel bundle, tightening the test.
                    ivx = 1.0 / dx[s:s + 1]
                    ivy = 1.0 / dy[s:s + 1]
                    ivz = 1.0 / dz[s:s + 1]
                    oxr = ox[s:s + 1]
                    oyr = oy[s:s + 1]
                    ozr = oz[s:s + 1]
                    alive_r = alive_m[s:s + 1]

                    def chunk_body(cK, carry, s=s, ivx=ivx, ivy=ivy,
                                   ivz=ivz, oxr=oxr, oyr=oyr, ozr=ozr,
                                   alive_r=alive_r):
                        btrn, bp, bu, bv = carry
                        if primary_clist:
                            # Bounce 0 walks this tile's compacted chunk
                            # list (primary frustum x chunk AABB, host
                            # prepass); later bounces walk all chunks.
                            cI = jnp.where(i == 0, ctab_ref[0, 0, 1 + cK],
                                           cK + 1)
                        else:
                            cI = cK

                        def row_heavy(carry):
                            btrn, bp, bu, bv = carry
                            trn, p_c, u_c, v_c = planar_chunk(
                                tab_pd_ref[pl.ds(cI * cprow, cprow), :],
                                tab_po_ref[pl.ds(cI * cporow, cporow), :],
                                tab_pg_ref[pl.ds(cI * 2 * PG_ROWS,
                                                 2 * PG_ROWS), :],
                                s)
                            b = jnp.where(trn > btrn, f(1.0), f(0.0))
                            # Exact select, NOT `bp + b*(p_c - bp)`: that
                            # form rounds twice (p_c - bp, then the add)
                            # and need not reproduce p_c even for b == 1.0
                            # when old/new params differ in magnitude —
                            # every chunk boundary a winner crossed
                            # injected relative error into the gathered
                            # normal/UV rows (the round-2 on-chip striping,
                            # docs/monument_1080p.png). Multiplication by
                            # exact 0.0/1.0 is exact; both operands are
                            # finite (the chunk gather's miss guard emits
                            # exact zeros), so 0 * x cannot produce NaN.
                            nb = 1.0 - b
                            return (jnp.maximum(trn, btrn),
                                    bp * nb + p_c * b,
                                    bu * nb + u_c * b,
                                    bv * nb + v_c * b)

                        if not cull:
                            return row_heavy(carry)
                        bx0 = (vab_ref[cI, 0] - oxr) * ivx
                        bx1 = (vab_ref[cI, 3] - oxr) * ivx
                        by0 = (vab_ref[cI, 1] - oyr) * ivy
                        by1 = (vab_ref[cI, 4] - oyr) * ivy
                        bz0 = (vab_ref[cI, 2] - ozr) * ivz
                        bz1 = (vab_ref[cI, 5] - ozr) * ivz
                        en = jnp.maximum(jnp.maximum(jnp.minimum(bx0, bx1),
                                                     jnp.minimum(by0, by1)),
                                         jnp.minimum(bz0, bz1))
                        ex = jnp.minimum(jnp.minimum(jnp.maximum(bx0, bx1),
                                                     jnp.maximum(by0, by1)),
                                         jnp.maximum(bz0, bz1))
                        # Conservative: chunk can matter only for a live
                        # lane whose ray crosses the box past t_min and
                        # before its current best (-btrn; -(-BIG) if none).
                        may = ((en <= ex) & (ex >= f(t_min))
                               & (alive_r > 0.0) & (en < -btrn))
                        mayf = jnp.where(may, f(1.0), f(0.0))
                        return jax.lax.cond(jnp.max(mayf) > 0.0, row_heavy,
                                            lambda c: c, carry)

                    if primary_clist:
                        count = jnp.where(i == 0, ctab_ref[0, 0, 0],
                                          jnp.int32(n_chunks - 1))
                        best = jax.lax.fori_loop(0, count, chunk_body, best)
                    else:
                        best = jax.lax.fori_loop(1, n_chunks, chunk_body,
                                                 best)
                elif n_chunks > 1:  # timing-ablation path: t-only carry
                    def chunk_body_t(cI, btrn, s=s):
                        trn, _, _, _ = planar_chunk(
                            tab_pd_ref[pl.ds(cI * cprow, cprow), :],
                            tab_po_ref[pl.ds(cI * cporow, cporow), :],
                            tab_pg_ref[pl.ds(cI * 2 * PG_ROWS,
                                             2 * PG_ROWS), :], s)
                        return jnp.maximum(trn, btrn)

                    best = (jax.lax.fori_loop(1, n_chunks, chunk_body_t,
                                              best[0]), None, None, None)
                tr_rows.append(best[0])
                paramr_list.append(best[1])
                uw_rows.append(best[2])
                vw_rows.append(best[3])

            if p_stream:
                best_trn8, paramr_rows, uw8, vw8 = _stream_walk()
            else:
                best_trn8 = _stack(tr_rows)
                if "nogather" not in ablate:
                    paramr_rows = paramr_list
                    uw8 = _stack(uw_rows)
                    vw8 = _stack(vw_rows)

        if has_sph:
            tn_best = _stack(tn_rows)
            hit_s = tn_best > f(-1.0e37)
            t_s = jnp.where(hit_s, -tn_best / a, f(_BIG))
        else:
            t_s = one_f * f(_BIG)
        if has_planar:
            hit_p8 = best_trn8 > f(-1.0e37)
            t_r = jnp.where(hit_p8, -best_trn8, f(_BIG))          # (8, L)
            rect_w = t_r < t_s                                    # (8, L)
        else:
            rect_w = None

        if n_vol:
            # Constant-medium candidates (volumes.rs:38-78): closed-form
            # boundary interval in the volume's object frame, exponential
            # scatter distance with the reference's log10 quirk. All
            # elementwise VPU work on (8, L) with SMEM scalars; V <= 2 in
            # every reference scene, so the loop is unrolled.
            ray_len = jnp.sqrt(a)
            inv_a = 1.0 / a
            t_vol = one_f * f(_BIG)
            vcr, vcg, vcb = zero_f, zero_f, zero_f
            v_id = zero_f
            for vI in range(n_vol):
                def VP(ii, _v=vI):
                    return vp_ref[_v, ii]

                cth, sth = VP(_VP_COS), VP(_VP_SIN)
                otx = ox - VP(_VP_OFFX)
                oty = oy - VP(_VP_OFFY)
                otz = oz - VP(_VP_OFFZ)
                oox = cth * otx - sth * otz
                ooz = sth * otx + cth * otz
                odx = cth * dx - sth * dz
                odz = sth * dx + cth * dz
                # Sphere boundary: quadratic roots. Y-rotation preserves
                # |d|, so the world-space a serves as a_obj.
                ocx = oox - VP(_VP_CX)
                ocy = oty - VP(_VP_CY)
                ocz = ooz - VP(_VP_CZ)
                half_b = ocx * odx + ocy * dy + ocz * odz
                c_t = ocx * ocx + ocy * ocy + ocz * ocz - VP(_VP_R2)
                disc = half_b * half_b - a * c_t
                sq = jnp.sqrt(disc)          # NaN on miss
                ok_s = disc > 0.0
                s_en = jnp.where(ok_s, (-half_b - sq) * inv_a, f(_BIG))
                s_ex = jnp.where(ok_s, (-half_b + sq) * inv_a, f(-_BIG))
                # Box boundary: slab test (aabb.rs:23-48).
                ivx, ivy, ivz = 1.0 / odx, 1.0 / dy, 1.0 / odz
                tx0 = (VP(_VP_B0X) - oox) * ivx
                tx1 = (VP(_VP_B1X) - oox) * ivx
                ty0 = (VP(_VP_B0Y) - oty) * ivy
                ty1 = (VP(_VP_B1Y) - oty) * ivy
                tz0 = (VP(_VP_B0Z) - ooz) * ivz
                tz1 = (VP(_VP_B1Z) - ooz) * ivz
                b_en = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                               jnp.minimum(ty0, ty1)),
                                   jnp.minimum(tz0, tz1))
                b_ex = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                               jnp.maximum(ty0, ty1)),
                                   jnp.maximum(tz0, tz1))
                ok_b = b_en < b_ex           # NaN (0*inf) compares false
                b_en = jnp.where(ok_b, b_en, f(_BIG))
                b_ex = jnp.where(ok_b, b_ex, f(-_BIG))
                # Blend by the (scalar) boundary type; inputs are
                # NaN-sanitized so the arithmetic mix is safe.
                wbox = VP(_VP_ISBOX)
                enter = wbox * b_en + (1.0 - wbox) * s_en
                exitt = wbox * b_ex + (1.0 - wbox) * s_ex
                # volumes.rs:44-53 clamps; scatter-distance sample :55-62.
                enter = jnp.maximum(enter, f(t_min))
                okv = enter < exitt
                enter = jnp.maximum(enter, 0.0)
                dist_in = (exitt - enter) * ray_len
                uv0_, _, _, _ = _rand4(rid, depth_u,
                                       rt_rng.SALT_VOLUME + vI, seed)
                uv0_ = jnp.maximum(uv0_, f(1e-12))
                hd = VP(_VP_NID) * (jnp.log(uv0_) * f(_LN10_INV))
                cand = okv & (hd <= dist_in)
                t_v = jnp.where(cand, enter + hd / ray_len, f(_BIG))
                win = t_v < t_vol
                vcr = jnp.where(win, zero_f + VP(_VP_CR), vcr)
                vcg = jnp.where(win, zero_f + VP(_VP_CG), vcg)
                vcb = jnp.where(win, zero_f + VP(_VP_CB), vcb)
                if emit_paths:
                    v_id = jnp.where(win, zero_f + f(vI), v_id)
                t_vol = jnp.minimum(t_v, t_vol)

        t_hit = jnp.minimum(t_s, t_r) if has_planar else t_s
        if n_vol:
            vol_w = t_vol < t_hit
            t_hit = jnp.minimum(t_hit, t_vol)
        hit = t_hit < f(1.0e37)
        t_safe = jnp.where(hit, t_hit, 0.0)

        if "nogather" in ablate:  # timing ablation: constant hit params
            u_w = v_w = one_f * 0.5

            def G(r):
                return one_f * 0.5

            def Gr(r):
                return one_f * 0.5
        else:
            if has_planar:
                u_w = uw8
                v_w = vw8

            def G(r):  # gathered sphere-winner row r, restacked to (8, L)
                return _stack([p[r:r + 1, :] + p[P_ROWS + r:P_ROWS + r + 1, :]
                               for p in param_rows])

            def Gr(r):  # gathered planar-winner row r, restacked to (8, L)
                return _stack([p[r:r + 1, :] + p[PG_ROWS + r:PG_ROWS + r + 1, :]
                               for p in paramr_rows])

        if has_sph and has_planar:
            def G2(rs, rr):  # family-merged hit param
                return jnp.where(rect_w, Gr(rr), G(rs))
        elif has_planar:
            def G2(rs, rr):
                return Gr(rr)
        else:
            def G2(rs, rr):
                return G(rs)

        # miss -> background, terminate (lib.rs:102-105). In defer mode the
        # contribution goes to this bounce's ctb slot instead of rr_.
        missf = jnp.where(alive & ~hit, f(1.0), f(0.0))
        mc_r = missf * tpr * bg_r
        mc_g = missf * tpg * bg_g
        mc_b = missf * tpb * bg_b
        if not defer_tex:
            rr_ = rr_ + mc_r
            rg_ = rg_ + mc_g
            rb_ = rb_ + mc_b
        alive = alive & hit

        # -- hit record (ops.sphere.sphere_record / ops.rect.rect_record) ----
        px = ox + t_safe * dx
        py = oy + t_safe * dy
        pz = oz + t_safe * dz
        if has_sph:
            cx = G(_R_AX) + time * G(_R_BX)    # center at this lane's time
            cy = G(_R_AY) + time * G(_R_BY)
            cz = G(_R_AZ) + time * G(_R_BZ)
            inv_r = G(_R_INVR)
            nx = (px - cx) * inv_r             # outward normal (signed rad.)
            ny = (py - cy) * inv_r
            nz = (pz - cz) * inv_r
            d_dot_n = dx * nx + dy * ny + dz * nz
            front = d_dot_n < 0.0
            if defer_tex:
                # Pre-flip outward normal: the deferred image fetch derives
                # the sphere UV from it outside the kernel (spherical.rs:62-77).
                snx, sny, snz = nx, ny, nz
            sgn = jnp.where(front, f(1.0), f(-1.0))
            nx, ny, nz = nx * sgn, ny * sgn, nz * sgn  # front-face flip
        if has_planar:
            # Barycentric-affine shading normal, raw/unnormalized
            # (triangular.rs:126 semantics; rects reduce to e_f). Front face
            # from d . nsh (hittable/mod.rs:40-45).
            nrx = Gr(_RP_NSX) + u_w * Gr(_RP_NUX) + v_w * Gr(_RP_NVX)
            nry = Gr(_RP_NSY) + u_w * Gr(_RP_NUY) + v_w * Gr(_RP_NVY)
            nrz = Gr(_RP_NSZ) + u_w * Gr(_RP_NUZ) + v_w * Gr(_RP_NVZ)
            front_r = (dx * nrx + dy * nry + dz * nrz) < 0.0
            rsgn = jnp.where(front_r, f(1.0), f(-1.0))
            nrx, nry, nrz = nrx * rsgn, nry * rsgn, nrz * rsgn
            if has_sph:
                nx = jnp.where(rect_w, nrx, nx)
                ny = jnp.where(rect_w, nry, ny)
                nz = jnp.where(rect_w, nrz, nz)
                front = (rect_w & front_r) | (~rect_w & front)
            else:
                nx, ny, nz, front = nrx, nry, nrz, front_r

        # -- texture (solid / checker / uv-debug; texture.rs:71-104) ---------
        scale = G2(_R_TSCALE, _RP_TSCALE)
        sines = (jnp.sin(scale * px) * jnp.sin(scale * py)
                 * jnp.sin(scale * pz))
        odd = sines < 0.0
        ttype = G2(_R_TTYPE, _RP_TTYPE)
        use2 = (ttype == 1.0) & odd
        tex_r = jnp.where(use2, G2(_R_C2R, _RP_C2R), G2(_R_C1R, _RP_C1R))
        tex_g = jnp.where(use2, G2(_R_C2G, _RP_C2G), G2(_R_C1G, _RP_C1G))
        tex_b = jnp.where(use2, G2(_R_C2B, _RP_C2B), G2(_R_C1B, _RP_C1B))
        if has_planar:
            # UVDebug = (u, v, 0) (texture.rs:97-104). ttype 4 only ever
            # appears on planar primitives (builder gating), so the sphere
            # branch of G2 can never select it.
            tex_u = Gr(_RP_TU0) + u_w * Gr(_RP_TUU) + v_w * Gr(_RP_TUV)
            tex_v = Gr(_RP_TV0) + u_w * Gr(_RP_TVU) + v_w * Gr(_RP_TVV)
            uvdbg = ttype == 4.0
            tex_r = jnp.where(uvdbg, tex_u, tex_r)
            tex_g = jnp.where(uvdbg, tex_v, tex_g)
            tex_b = jnp.where(uvdbg, tex_b * 0.0, tex_b)

        if defer_tex:
            # Noise/image texels become 1.0 here; the record (a, b, c, code)
            # lets the host evaluate the true texel (textures.texture_value)
            # and fold it back in. abc = hit point for noise, outward normal
            # for sphere-image (-> spherical UV), (u, v, 0) for planar-image;
            # code = +-(texid + 1), negative for planar, 0 for none.
            is_nse = ttype == 2.0
            is_dfr = (is_nse | (ttype == 3.0)) & alive
            if n_vol:
                is_dfr = is_dfr & ~vol_w
            texid = G2(_R_TEXID, _RP_TEXID)
            if has_sph and has_planar:
                ia = jnp.where(rect_w, u_w, snx)
                ib = jnp.where(rect_w, v_w, sny)
                ic = jnp.where(rect_w, zero_f, snz)
                sgn_d = jnp.where(rect_w, f(-1.0), f(1.0))
            elif has_planar:
                ia, ib, ic = u_w, v_w, zero_f
                sgn_d = -one_f
            else:
                ia, ib, ic = snx, sny, snz
                sgn_d = one_f
            da = jnp.where(is_nse, px, ia)
            db = jnp.where(is_nse, py, ib)
            dc_ = jnp.where(is_nse, pz, ic)
            dfrf = jnp.where(is_dfr, one_f, zero_f)
            dfr_ref[pl.ds(i * 32, 8), :] = da
            dfr_ref[pl.ds(i * 32 + 8, 8), :] = db
            dfr_ref[pl.ds(i * 32 + 16, 8), :] = dc_
            dfr_ref[pl.ds(i * 32 + 24, 8), :] = dfrf * (texid + 1.0) * sgn_d
            tex_r = jnp.where(is_dfr, one_f, tex_r)
            tex_g = jnp.where(is_dfr, one_f, tex_g)
            tex_b = jnp.where(is_dfr, one_f, tex_b)

        # -- scatter union (materials.scatter) ------------------------------
        mtype = G2(_R_MTYPE, _RP_MTYPE)
        if n_vol:
            # Volume winner: isotropic phase function over the medium's
            # solid albedo (volumes.rs:64-68 + material.rs:154-163).
            mtype = jnp.where(vol_w, f(4.0), mtype)
            tex_r = jnp.where(vol_w, vcr, tex_r)
            tex_g = jnp.where(vol_w, vcg, tex_g)
            tex_b = jnp.where(vol_w, vcb, tex_b)
        inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + f(1e-20))
        ux, uy, uz = dx * inv_len, dy * inv_len, dz * inv_len

        # Lambertian (material.rs:42-56)
        a1, a2, _, _ = _rand4(rid, depth_u, rt_rng.SALT_LAMBERTIAN, seed)
        svx, svy, svz = _unit_vec(a1, a2)
        lamx, lamy, lamz = nx + svx, ny + svy, nz + svz
        nz8 = f(1e-8)
        degen = ((jnp.abs(lamx) < nz8) & (jnp.abs(lamy) < nz8)
                 & (jnp.abs(lamz) < nz8))
        lamx = jnp.where(degen, nx, lamx)
        lamy = jnp.where(degen, ny, lamy)
        lamz = jnp.where(degen, nz, lamz)

        if "noshade" in ablate:  # timing ablation: lambertian-for-all
            alive2 = alive
            ox = jnp.where(alive2, px, ox)
            oy = jnp.where(alive2, py, oy)
            oz = jnp.where(alive2, pz, oz)
            dx = jnp.where(alive2, lamx, dx)
            dy = jnp.where(alive2, lamy, dy)
            dz = jnp.where(alive2, lamz, dz)
            tpr = jnp.where(alive2, tpr * tex_r, tpr)
            tpg = jnp.where(alive2, tpg * tex_g, tpg)
            tpb = jnp.where(alive2, tpb * tex_b, tpb)
            return (i + 1, ox, oy, oz, dx, dy, dz, tpr, tpg, tpb,
                    rr_, rg_, rb_, jnp.where(alive2, f(1.0), f(0.0)), seg)

        # Metal (material.rs:77-95)
        m1_, m2_, m3_, _ = _rand4(rid, depth_u, rt_rng.SALT_METAL, seed)
        bx, by, bz = _unit_vec(m1_, m2_)
        brad = jnp.exp(jnp.log(jnp.maximum(m3_, f(1e-30))) * f(1.0 / 3.0))
        fuzz = G2(_R_FUZZ, _RP_FUZZ)
        u_dot_n = ux * nx + uy * ny + uz * nz
        metx = ux - 2.0 * u_dot_n * nx + fuzz * bx * brad
        mety = uy - 2.0 * u_dot_n * ny + fuzz * by * brad
        metz = uz - 2.0 * u_dot_n * nz + fuzz * bz * brad
        met_alive = (metx * nx + mety * ny + metz * nz) > 0.0

        # Dielectric (material.rs:115-142)
        e1, _, _, _ = _rand4(rid, depth_u, rt_rng.SALT_DIELECTRIC, seed)
        ior = G2(_R_IOR, _RP_IOR)
        ratio = jnp.where(front, 1.0 / jnp.maximum(ior, f(1e-6)), ior)
        cos_t = jnp.minimum(-u_dot_n, 1.0)
        sin_t = jnp.sqrt(jnp.maximum(f(1e-12), 1.0 - cos_t * cos_t))
        cannot = ratio * sin_t > 1.0
        r0 = (1.0 - ratio) / (1.0 + ratio)
        r0 = r0 * r0
        omc = 1.0 - cos_t
        omc2 = omc * omc
        schlick = r0 + (1.0 - r0) * omc2 * omc2 * omc
        choose_reflect = cannot | (schlick > e1)
        # refract (vec3.rs:144-151)
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

        # Select by material type
        is_met = mtype == 1.0
        is_die = mtype == 2.0
        is_light = mtype == 3.0
        ndx = jnp.where(is_met, metx, jnp.where(is_die, diex, lamx))
        ndy = jnp.where(is_met, mety, jnp.where(is_die, diey, lamy))
        ndz = jnp.where(is_met, metz, jnp.where(is_die, diez, lamz))
        if n_vol:
            # Isotropic (material.rs:154-163): uniform ball direction.
            q1, q2, q3, _ = _rand4(rid, depth_u, rt_rng.SALT_ISOTROPIC, seed)
            qx, qy, qz = _unit_vec(q1, q2)
            qrad = jnp.exp(jnp.log(jnp.maximum(q3, f(1e-30))) * f(1.0 / 3.0))
            is_iso = mtype == 4.0
            ndx = jnp.where(is_iso, qx * qrad, ndx)
            ndy = jnp.where(is_iso, qy * qrad, ndy)
            ndz = jnp.where(is_iso, qz * qrad, ndz)

        att_r = jnp.where(is_die, 1.0, jnp.where(is_light, 0.0, tex_r))
        att_g = jnp.where(is_die, 1.0, jnp.where(is_light, 0.0, tex_g))
        att_b = jnp.where(is_die, 1.0, jnp.where(is_light, 0.0, tex_b))

        lightf = jnp.where(alive & is_light, f(1.0), f(0.0))
        lc_r = lightf * tpr * tex_r        # emitted (light_source.rs:22-24)
        lc_g = lightf * tpg * tex_g
        lc_b = lightf * tpb * tex_b
        if defer_tex:
            # All radiance is emitted via per-bounce slots; the host applies
            # the deferred texel products (inclusive at the emitting bounce,
            # so image-emission lights get their texel too).
            ctb_ref[pl.ds(i * 24, 8), :] = mc_r + lc_r
            ctb_ref[pl.ds(i * 24 + 8, 8), :] = mc_g + lc_g
            ctb_ref[pl.ds(i * 24 + 16, 8), :] = mc_b + lc_b
        else:
            rr_ = rr_ + lc_r
            rg_ = rg_ + lc_g
            rb_ = rb_ + lc_b
        if emit_paths:
            # Winner code for the VJP replay: fam (1 sphere / 2 planar /
            # 3 volume) + 4 * global index; 0 = miss or dead lane. Exact-tie
            # winners sum indices in the one-hot gather (measure zero).
            pcode = zero_f
            if has_sph:
                pcode = f(1.0) + 4.0 * (128.0 * G(_R_IDX_HI) + G(_R_IDX_LO))
            if has_planar:
                pp = f(2.0) + 4.0 * (128.0 * Gr(_RP_IDX_HI)
                                     + Gr(_RP_IDX_LO))
                pcode = jnp.where(rect_w, pp, pcode) if has_sph else pp
            if n_vol:
                pcode = jnp.where(vol_w, f(3.0) + 4.0 * v_id, pcode)
            pth_ref[pl.ds(i * 8, 8), :] = jnp.where(alive, pcode, zero_f)
        tpr = jnp.where(alive, tpr * att_r, tpr)
        tpg = jnp.where(alive, tpg * att_g, tpg)
        tpb = jnp.where(alive, tpb * att_b, tpb)
        # select over i1 vectors is unsupported in Mosaic; use bool algebra
        sc_alive = (is_met & met_alive) | (~is_met & ~is_light)
        alive = alive & sc_alive

        ox = jnp.where(alive, px, ox)
        oy = jnp.where(alive, py, oy)
        oz = jnp.where(alive, pz, oz)
        dx = jnp.where(alive, ndx, dx)
        dy = jnp.where(alive, ndy, dy)
        dz = jnp.where(alive, ndz, dz)
        return (i + 1, ox, oy, oz, dx, dy, dz, tpr, tpg, tpb,
                rr_, rg_, rb_, jnp.where(alive, f(1.0), f(0.0)), seg)

    # The depth loop exits early once the whole tile is dead; per-depth aux
    # planes for the remaining depths must read as zero contributions.
    if defer_tex:
        ctb_ref[:, :] = jnp.zeros(ctb_ref.shape, f)
        dfr_ref[:, :] = jnp.zeros(dfr_ref.shape, f)
    if emit_paths:
        pth_ref[:, :] = jnp.zeros(pth_ref.shape, f)

    st0 = bounce_state()
    if p_k or pp_k:
        # Statically peel bounce 0: primaries ride the per-tile compacted
        # tables; the while loop then covers bounces 1+ on full tables.
        # (i == 0 comparisons inside this instantiation constant-fold.)
        st0 = body(st0, primary=True)
    st = jax.lax.while_loop(cond, body, st0)
    (_, fox, foy, foz, fdx, fdy, fdz, ftr, ftg, ftb,
     rr_, rg_, rb_, falive, seg) = st

    rad_ref[0:8, :] = rr_
    rad_ref[8:16, :] = rg_
    rad_ref[16:24, :] = rb_
    seg_ref[:, :] = seg  # f32 counts; cast to int32 outside the kernel
    if phase_out:
        stout_ref[0:8, :] = fox
        stout_ref[8:16, :] = foy
        stout_ref[16:24, :] = foz
        stout_ref[24:32, :] = fdx
        stout_ref[32:40, :] = fdy
        stout_ref[40:48, :] = fdz
        stout_ref[48:56, :] = ftr
        stout_ref[56:64, :] = ftg
        stout_ref[64:72, :] = ftb
        stout_ref[72:80, :] = rr_
        stout_ref[80:88, :] = rg_
        stout_ref[88:96, :] = rb_
        stout_ref[96:104, :] = time
        stout_ref[104:112, :] = falive
        stout_ref[112:120, :] = seg


# --------------------------------------------------------------------------
# Host-side wrapper
# --------------------------------------------------------------------------

def _build_table(scene: SceneData, s_pad: int,
                 s_chunk: int | None = None) -> Array:
    """Assemble the per-sphere coefficient/gather tables.

    Returns (tab_full (2P, s_pad), tab_int (144, s_pad)); when s_chunk
    divides s_pad into c > 1 chunks, both are restacked chunk-major into
    (c*2P, s_chunk) / (c*144, s_chunk) with chunk cI's block in its own
    sublane row group (same layout discipline as _build_planar_tables)."""
    sp = scene.spheres
    mt = scene.materials
    tx = scene.textures
    S = sp.radius.shape[0]

    mat = sp.mat
    tid = mt.tex[mat]
    valid = sp.valid
    dt = sp.t1 - sp.t0
    inv_dt = jnp.where(valid, 1.0 / jnp.where(dt == 0, 1.0, dt), 0.0)
    inv_r = jnp.where(valid, 1.0 / jnp.where(sp.radius == 0, 1.0, sp.radius),
                      0.0)
    dc = sp.c1 - sp.c0
    beta = dc * inv_dt[:, None]                    # center velocity
    alpha = sp.c0 - sp.t0[:, None] * beta          # center at time 0
    k0 = jnp.sum(alpha * alpha, axis=1) - sp.radius * sp.radius
    k0 = jnp.where(valid, k0, _K0_INVALID)         # padded slots never hit
    k1 = 2.0 * jnp.sum(alpha * beta, axis=1)
    k2 = jnp.sum(beta * beta, axis=1)
    c1c = tx.color1[tid]
    c2c = tx.color2[tid]

    odotd_c = jnp.where(valid, -1.0, 0.0)   # o.d feature coeff (-> -half_b)
    osq_c = jnp.where(valid, 1.0, 0.0)      # |o|^2 feature coeff (-> c_term)
    rows = [
        alpha[:, 0], alpha[:, 1], alpha[:, 2],
        beta[:, 0], beta[:, 1], beta[:, 2],
        odotd_c,
        -2.0 * alpha[:, 0], -2.0 * alpha[:, 1], -2.0 * alpha[:, 2],
        -2.0 * beta[:, 0], -2.0 * beta[:, 1], -2.0 * beta[:, 2],
        k0, k1, k2,
        osq_c,
        inv_r,
        mt.mtype[mat].astype(jnp.float32),
        mt.fuzz[mat], mt.ior[mat],
        tx.ttype[tid].astype(jnp.float32),
        c1c[:, 0], c1c[:, 1], c1c[:, 2],
        c2c[:, 0], c2c[:, 1], c2c[:, 2],
        tx.scale[tid],
        tid.astype(jnp.float32),
        jnp.arange(S, dtype=jnp.float32) // 128,
        jnp.arange(S, dtype=jnp.float32) % 128,
    ]
    tab = jnp.stack(rows, axis=0).astype(jnp.float32)     # (32, S)
    # Padded columns: zero coefficients except k0, which must stay "invalid".
    tab = jnp.pad(tab, ((0, P_ROWS - tab.shape[0]), (0, 0)))
    if s_pad > S:
        padcol = jnp.zeros((P_ROWS, s_pad - S), jnp.float32)
        padcol = padcol.at[_R_K0, :].set(_K0_INVALID)
        tab = jnp.concatenate([tab, padcol], axis=1)
    elif s_pad < S:  # timing-ablation only: truncated table, wrong image
        tab = tab[:, :s_pad]
    # Split-gather blocks: rows [0, P) hold hi = f32(bf16(x)), rows
    # [P, 2P) lo = x - hi. Gathering hi+lo at DEFAULT (bf16-pass)
    # precision reconstructs x to ~8e-6 (hi is bf16-representable so the
    # pass is exact on it; lo only rounds at 2^-17 |x|), and on exact
    # backends (CPU tests) hi + lo == x bitwise.
    hi = _bf16_trunc(tab)
    tab_full = jnp.concatenate([hi, tab - hi], axis=0)
    # K-split intersection table (kernel comment at the matmuls): each
    # coefficient x = xh + xm + xl (three 8-bit-mantissa bf16 pieces cover
    # the f32 mantissa); paired with 3-way-split features, the six block
    # products hh+hm+hl+mh+mm+lh reconstruct x*y to ~2^-24 in ONE
    # DEFAULT-precision pass (K grows 8x but still pads to 128; only the
    # 2^-32 ll term is dropped). A 2-way split (~2^-17) was NOT enough:
    # jumpy's glass-shell re-intersections sit on c_term ~ 0 knife edges
    # and flipped 6%% of segments; 6 blocks (~2^-24) still flipped ~1%%
    # of the near-tangent outlier budget.
    def _ksplit(t, pad_to):
        th = _bf16_trunc(t)
        tm = _bf16_trunc(t - th)
        tl = t - th - tm
        blk = jnp.concatenate([th, th, th, tm, tm, tm, tl, tl], axis=0)
        return jnp.pad(blk, ((0, pad_to - blk.shape[0]), (0, 0)))
    tab_int = jnp.concatenate(
        [_ksplit(tab[_R_AX:_R_ODOTD + 1], 64),
         _ksplit(tab[_R_M2AX:_R_OSQ + 1], 80)], axis=0)  # (144, s_pad)
    if s_chunk and s_chunk < s_pad:
        c = s_pad // s_chunk

        def _cs(t):
            rows = t.shape[0]
            return (t.reshape(rows, c, s_chunk).transpose(1, 0, 2)
                    .reshape(c * rows, s_chunk))

        tab_full, tab_int = _cs(tab_full), _cs(tab_int)
    return tab_full, tab_int


def _sphere_chunk_aabbs(scene: SceneData, s_pad: int,
                        s_chunk: int) -> Array:
    """(c, 8) per-chunk sphere AABBs [bmin xyz, bmax xyz, 0, 0] for the
    in-kernel chunk cull (SMEM scalars). Builder Morton order makes chunks
    spatially compact; a moving sphere is bounded by the union of its
    endpoint boxes (spherical.rs:130-150 semantics — exact for shutter
    times within [t0, t1], which every reference scene satisfies).
    Negative-radius (hollow-glass) shells bound by |r|. Invalid/padded
    slots carry an inverted box so all-padding chunks always cull."""
    sp = scene.spheres
    r = jnp.abs(sp.radius)[:, None]
    lo = jnp.minimum(sp.c0, sp.c1) - r
    hi = jnp.maximum(sp.c0, sp.c1) + r
    lo = jnp.where(sp.valid[:, None], lo, jnp.inf)
    hi = jnp.where(sp.valid[:, None], hi, -jnp.inf)
    S = lo.shape[0]
    lo = jnp.pad(lo, ((0, s_pad - S), (0, 0)), constant_values=jnp.inf)
    hi = jnp.pad(hi, ((0, s_pad - S), (0, 0)), constant_values=-jnp.inf)
    c = s_pad // s_chunk
    lo = lo.reshape(c, s_chunk, 3).min(axis=1)
    hi = hi.reshape(c, s_chunk, 3).max(axis=1)
    tab = jnp.concatenate([lo, hi, jnp.zeros((c, 2), jnp.float32)], axis=1)
    return jax.lax.stop_gradient(tab)


def _build_planar_tables(scene: SceneData, r_pad: int,
                         with_rects: bool, with_tris: bool,
                         r_chunk: int | None = None,
                         ksplit_off: bool = False,
                         ksplit_chunks: bool = False):
    """(tab_pd (c*8, 3*rc), tab_po (c*8, 4*rc), tab_pg (c*2*PG_ROWS, rc))
    with c = r_pad // r_chunk chunks, each chunk's block in its own
    sublane row group.

    Unified rect + triangle coefficient tables (row-layout comment at the
    top). Column order: rects first, then triangles, then padding. Invalid/
    padded slots carry all-zero coefficients so t = 0/0 = NaN.
    """
    mt = scene.materials
    tx = scene.textures

    # Per-primitive columns, built as (R, ...) numpy-ish jnp blocks.
    n_rows, k_rows = [], []
    ua_rows, ca_rows, ub_rows, cb_rows = [], [], [], []
    flag_rows, mat_rows = [], []
    ns0_rows, nsu_rows, nsv_rows = [], [], []
    tu_rows, tv_rows = [], []   # (R, 3) affine coeffs (c0, cu, cv)

    if with_rects:
        rc = scene.rects
        f_ax = jnp.asarray(rc.axis)              # fixed axis (0/1/2)
        # varying axes in the reference UV order (scene.data.Rects docstring)
        a_ax = jnp.where(f_ax == 0, 1, 0)
        b_ax = jnp.where(f_ax == 2, 1, 2)
        valid = rc.valid
        eye = jnp.eye(3, dtype=jnp.float32)
        vf = jnp.where(valid[:, None], eye[f_ax], 0.0)      # (R, 3)
        inv_da = jnp.where(valid, 1.0 / jnp.where(rc.a1 == rc.a0, 1.0,
                                                  rc.a1 - rc.a0), 0.0)
        inv_db = jnp.where(valid, 1.0 / jnp.where(rc.b1 == rc.b0, 1.0,
                                                  rc.b1 - rc.b0), 0.0)
        R = rc.axis.shape[0]
        zc = jnp.zeros((R,), jnp.float32)
        vld = valid.astype(jnp.float32)
        n_rows.append(vf)
        k_rows.append(jnp.where(valid, rc.k, 0.0))
        ua_rows.append(eye[a_ax] * inv_da[:, None])
        ca_rows.append(-rc.a0 * inv_da)
        ub_rows.append(eye[b_ax] * inv_db[:, None])
        cb_rows.append(-rc.b0 * inv_db)
        flag_rows.append(zc)
        mat_rows.append(rc.mat)
        ns0_rows.append(vf)
        nsu_rows.append(jnp.zeros((R, 3), jnp.float32))
        nsv_rows.append(jnp.zeros((R, 3), jnp.float32))
        # tex_u = u, tex_v = v
        tu_rows.append(jnp.stack([zc, vld, zc], axis=1))
        tv_rows.append(jnp.stack([zc, zc, vld], axis=1))

    if with_tris:
        tr = scene.triangles
        valid = tr.valid
        vld3 = valid.astype(jnp.float32)[:, None]
        ab = (tr.v1 - tr.v0) * vld3
        ac = (tr.v2 - tr.v0) * vld3
        n = jnp.cross(ab, ac)                               # (T, 3)
        nsq = jnp.sum(n * n, axis=1)
        inv_nsq = jnp.where(nsq > 0.0, 1.0 / jnp.where(nsq == 0, 1.0, nsq),
                            0.0)[:, None]                   # degenerate -> 0
        ua = jnp.cross(ac, n) * inv_nsq                     # ua.ab=1, ua.ac=0
        ub = jnp.cross(n, ab) * inv_nsq                     # ub.ab=0, ub.ac=1
        nz = jnp.where(valid[:, None] & (nsq > 0.0)[:, None], 1.0, 0.0)
        n = n * nz
        ua, ub = ua * nz, ub * nz
        n_rows.append(n)
        k_rows.append(jnp.sum(n * tr.v0, axis=1))
        ua_rows.append(ua)
        ca_rows.append(-jnp.sum(ua * tr.v0, axis=1))
        ub_rows.append(ub)
        cb_rows.append(-jnp.sum(ub * tr.v0, axis=1))
        flag_rows.append(jnp.where(valid, 1.0, 0.0))
        mat_rows.append(tr.mat)
        ns0_rows.append(tr.n0 * vld3)
        nsu_rows.append((tr.n1 - tr.n0) * vld3)
        nsv_rows.append((tr.n2 - tr.n0) * vld3)
        # tex affine from per-vertex UVs: tex = uv0 + u*(uv1-uv0) + v*(uv2-uv0)
        uv0, uv1, uv2 = tr.uv0 * vld3[:, :2], tr.uv1, tr.uv2
        tu_rows.append(jnp.stack(
            [uv0[:, 0], (uv1 - uv0)[:, 0], (uv2 - uv0)[:, 0]], axis=1) * vld3)
        tv_rows.append(jnp.stack(
            [uv0[:, 1], (uv1 - uv0)[:, 1], (uv2 - uv0)[:, 1]], axis=1) * vld3)

    def cat(rows):
        return jnp.concatenate(rows, axis=0)

    n_all = cat(n_rows).astype(jnp.float32)                 # (R, 3)
    ua_all = cat(ua_rows).astype(jnp.float32)
    ub_all = cat(ub_rows).astype(jnp.float32)
    R = n_all.shape[0]

    def padc(m, rows):  # (R, rows) -> transposed (rows, r_pad)
        m = jnp.pad(m.astype(jnp.float32).reshape(R, rows),
                    ((0, r_pad - R), (0, 0)))
        return m.T

    # Chunk-major, SUBLANE-stacked layout: each chunk's coefficient block
    # lives in its own 8-sublane row group, so every VMEM table's lane dim
    # is O(r_chunk) regardless of scene size. (The previous lane-stacked
    # layout put 4*r_pad lanes in one block; the TPU compile helper crashes
    # for any planar table with >= ~15k lanes — r_pad 3584 compiles,
    # 4096 does not, bisected on-chip. tools/perf_r2e.py.)
    rc = r_chunk or r_pad
    c = r_pad // rc
    # Single-chunk scenes take the K-split planar matmuls; ksplit_off
    # forces the raw layout. ksplit_chunks (round 6) extends the K-split
    # to chunked tables — one DEFAULT pass per chunk instead of 6-pass
    # HIGHEST tiny-K matmuls, which dominated chunk-walk cost (~2.5K
    # cycles per chunk-row on v5e; book2's ~18 taken planar chunks x 8
    # rows = ~360K cycles per tile-bounce).
    ksplit = (c == 1 or ksplit_chunks) and not ksplit_off

    def _tks(t):
        # Table side of the 8-block K-split: [Th Th Th Tm Tm Tm Tl Tl]
        # pairing the kernel's [Fh Fm Fl Fh Fm Fl Fh Fm] feature rows.
        th = _bf16_trunc(t)
        tm = _bf16_trunc(t - th)
        tl = t - th - tm
        return jnp.concatenate([th, th, th, tm, tm, tm, tl, tl], axis=0)

    def chunk_stack(blocks, used_rows):
        # blocks: list of (used_rows, r_pad) -> (c*8, len(blocks)*rc) with
        # chunk cI's [b0|b1|...] block in sublane rows [8cI, 8cI+used_rows).
        x = jnp.stack(blocks, axis=0)                    # (B, rows, r_pad)
        B = x.shape[0]
        group = -(-used_rows // 8) * 8
        x = x.reshape(B, used_rows, c, rc)
        x = x.transpose(2, 1, 0, 3).reshape(c, used_rows, B * rc)
        x = jnp.pad(x, ((0, 0), (0, group - used_rows), (0, 0)))
        return x.reshape(c * group, B * rc)

    pd_blocks = [padc(n_all, 3), padc(ua_all, 3), padc(ub_all, 3)]
    if ksplit:
        tab_pd = chunk_stack([_tks(b) for b in pd_blocks], 24)
    else:
        tab_pd = chunk_stack(pd_blocks, 3)
    num_c = jnp.concatenate([-n_all, cat(k_rows)[:, None]], 1)
    u0_c = jnp.concatenate([ua_all, cat(ca_rows)[:, None]], 1)
    v0_c = jnp.concatenate([ub_all, cat(cb_rows)[:, None]], 1)
    zero3 = jnp.zeros((R, 3), jnp.float32)
    fl_c = jnp.concatenate([zero3, cat(flag_rows)[:, None]], 1)
    po_blocks = [padc(num_c, 4), padc(u0_c, 4), padc(v0_c, 4),
                 padc(fl_c, 4)]
    if ksplit:
        tab_po = chunk_stack([_tks(b) for b in po_blocks], 32)
    else:
        tab_po = chunk_stack(po_blocks, 4)

    mat = cat(mat_rows)
    tid = mt.tex[mat]
    c1c = tx.color1[tid]
    c2c = tx.color2[tid]
    ns0 = cat(ns0_rows)
    nsu = cat(nsu_rows)
    nsv = cat(nsv_rows)
    tu = cat(tu_rows)
    tv = cat(tv_rows)
    rows = [
        ns0[:, 0], ns0[:, 1], ns0[:, 2],
        nsu[:, 0], nsu[:, 1], nsu[:, 2],
        nsv[:, 0], nsv[:, 1], nsv[:, 2],
        mt.mtype[mat].astype(jnp.float32), mt.fuzz[mat], mt.ior[mat],
        tx.ttype[tid].astype(jnp.float32),
        c1c[:, 0], c1c[:, 1], c1c[:, 2],
        c2c[:, 0], c2c[:, 1], c2c[:, 2],
        tx.scale[tid],
        tu[:, 0], tu[:, 1], tu[:, 2],
        tv[:, 0], tv[:, 1], tv[:, 2],
        tid.astype(jnp.float32),
        jnp.arange(R, dtype=jnp.float32) // 128,
        jnp.arange(R, dtype=jnp.float32) % 128,
    ]
    tab_pg = jnp.stack(rows, axis=0).astype(jnp.float32)
    tab_pg = jnp.pad(tab_pg, ((0, PG_ROWS - tab_pg.shape[0]),
                              (0, r_pad - R)))
    # Split-gather blocks [hi; lo] (see _build_table comment).
    pg_hi = _bf16_trunc(tab_pg)
    tab_pg = jnp.concatenate([pg_hi, tab_pg - pg_hi], axis=0)
    # Same chunk-major sublane stacking: (2PG, r_pad) -> (c*2PG, rc).
    tab_pg = (tab_pg.reshape(2 * PG_ROWS, c, rc).transpose(1, 0, 2)
              .reshape(c * 2 * PG_ROWS, rc))
    return tab_pd, tab_po, tab_pg


def _planar_chunk_aabbs(scene: SceneData, r_pad: int, r_chunk: int,
                        with_rects: bool, with_tris: bool) -> Array:
    """(c, 8) per-chunk AABBs [bmin xyz, bmax xyz, 0, 0] for in-kernel
    chunk culling (SMEM scalars). Builder Morton order makes chunks
    spatially compact. Invalid/padded rows carry an inverted box so
    all-padding chunks always cull; stop_gradient — culling only gates
    discrete skips (bvh.rs:101-120's role, re-thought as chunk pruning)."""
    mins, maxs = [], []
    if with_rects:
        rc = scene.rects
        eye = jnp.eye(3, dtype=jnp.float32)
        f_ax = jnp.asarray(rc.axis)
        a_ax = jnp.where(f_ax == 0, 1, 0)
        b_ax = jnp.where(f_ax == 2, 1, 2)
        pad = 1e-4  # rectangular.rs thin-slab padding
        lo = (eye[f_ax] * (rc.k - pad)[:, None]
              + eye[a_ax] * jnp.minimum(rc.a0, rc.a1)[:, None]
              + eye[b_ax] * jnp.minimum(rc.b0, rc.b1)[:, None])
        hi = (eye[f_ax] * (rc.k + pad)[:, None]
              + eye[a_ax] * jnp.maximum(rc.a0, rc.a1)[:, None]
              + eye[b_ax] * jnp.maximum(rc.b0, rc.b1)[:, None])
        mins.append(jnp.where(rc.valid[:, None], lo, jnp.inf))
        maxs.append(jnp.where(rc.valid[:, None], hi, -jnp.inf))
    if with_tris:
        tr = scene.triangles
        lo = jnp.minimum(jnp.minimum(tr.v0, tr.v1), tr.v2)
        hi = jnp.maximum(jnp.maximum(tr.v0, tr.v1), tr.v2)
        mins.append(jnp.where(tr.valid[:, None], lo, jnp.inf))
        maxs.append(jnp.where(tr.valid[:, None], hi, -jnp.inf))
    lo = jnp.concatenate(mins, axis=0)
    hi = jnp.concatenate(maxs, axis=0)
    R = lo.shape[0]
    lo = jnp.pad(lo, ((0, r_pad - R), (0, 0)), constant_values=jnp.inf)
    hi = jnp.pad(hi, ((0, r_pad - R), (0, 0)), constant_values=-jnp.inf)
    c = r_pad // r_chunk
    lo = lo.reshape(c, r_chunk, 3).min(axis=1)
    hi = hi.reshape(c, r_chunk, 3).max(axis=1)
    tab = jnp.concatenate([lo, hi, jnp.zeros((c, 2), jnp.float32)], axis=1)
    return jax.lax.stop_gradient(tab)


def _build_vol_par(scene: SceneData) -> Array:
    """(V, VP_COLS) per-volume SMEM scalars (row layout at the top).

    Invalid rows are forced to never hit: sphere boundaries get r^2 = -1e30
    (negative discriminant), box boundaries an empty [1, 0] slab.
    """
    from raytracer_weekend_tpu.scene.data import VOL_BOX

    vol = scene.volumes
    tid = scene.materials.tex[vol.mat]
    col = scene.textures.color1[tid]
    valid = vol.valid
    r2 = jnp.where(valid, vol.radius * vol.radius, -1e30)
    bmin = jnp.where(valid[:, None], vol.bmin, 1.0)
    bmax = jnp.where(valid[:, None], vol.bmax, 0.0)
    rows = [
        (vol.vtype == VOL_BOX).astype(jnp.float32),
        vol.center[:, 0], vol.center[:, 1], vol.center[:, 2],
        r2,
        bmin[:, 0], bmin[:, 1], bmin[:, 2],
        bmax[:, 0], bmax[:, 1], bmax[:, 2],
        vol.cos_t, vol.sin_t,
        vol.offset[:, 0], vol.offset[:, 1], vol.offset[:, 2],
        vol.neg_inv_density,
        col[:, 0], col[:, 1], col[:, 2],
    ]
    tab = jnp.stack(rows, axis=1).astype(jnp.float32)      # (V, 20)
    return jnp.pad(tab, ((0, 0), (0, VP_COLS - tab.shape[1])))


def _pack_par(scene: SceneData, cam: Camera) -> Array:
    parts = [
        cam.origin, cam.lower_left, cam.horizontal, cam.vertical,
        cam.u, cam.v,
        jnp.stack([cam.lens_radius, cam.time0, cam.time1 - cam.time0]),
        scene.background,
    ]
    return jnp.concatenate(parts).astype(jnp.float32).reshape(1, 24)


def _combine_deferred(scene: SceneData, ctb: Array, dfr: Array,
                      *, has_noise: bool, has_image: bool,
                      pallas_noise: bool = False,
                      return_factors: bool = False,
                      remat: bool = False):
    """rad = sum_k c_k * prod_{j<=k} f_j  over deferred noise/image texels.

    The kernel shaded deferred texels as 1.0 and recorded (a, b, c, code)
    per bounce; the true texel is evaluated here with the staged path's own
    texture code (textures.texture_value — exact parity, including the
    nearest-fetch of image_texture.rs:34-52 and the Perlin marble of
    texture.rs:90-94). The factor product is inclusive at the emitting
    bounce, so image-emission lights (scenes.rs:292-294) apply their texel
    to their own emission; attenuation factors multiply every later bounce.
    """
    from raytracer_weekend_tpu import textures as tex_mod
    from raytracer_weekend_tpu.ops.sphere import sphere_uv

    def combine(args):
        ctb, dfr = args
        code = jnp.round(dfr[..., 3]).astype(jnp.int32)    # (b, D)
        absid = jnp.abs(code)
        texid = jnp.maximum(absid - 1, 0)
        abc = dfr[..., 0:3]
        is_img = scene.textures.ttype[texid] == tex_mod.IMAGE
        u_s, v_s = sphere_uv(abc)                # sphere-image: abc = outward
        sphere_img = is_img & (code > 0)
        u = jnp.where(sphere_img, u_s, dfr[..., 0])  # planar: abc = (u,v,0)
        v = jnp.where(sphere_img, v_s, dfr[..., 1])
        # The `live` mask lets the Pallas perlin kernel skip all-dead
        # point tiles. Lane-major record order (the emitted layout) makes
        # a tile = 128 block-tiled lanes x all bounces — dead exactly for
        # all-sky pixel blocks. RTW_DEFER_TMAJOR=1 instead evaluates in
        # bounce-major order (dead tails cluster harder, but the
        # transposes measured +143 ms on simple_light v5e — net loss
        # there, net win on two_perlin; default off).
        if os.environ.get("RTW_DEFER_TMAJOR", "0") == "1":
            f_t = tex_mod.texture_value(
                scene.textures, texid.T, u.T, v.T, abc.transpose(1, 0, 2),
                has_noise=has_noise, has_image=has_image,
                pallas_noise=pallas_noise, live=absid.T > 0)
            f_rgb = f_t.transpose(1, 0, 2)
        else:
            f_rgb = tex_mod.texture_value(
                scene.textures, texid, u, v, abc,
                has_noise=has_noise, has_image=has_image,
                pallas_noise=pallas_noise, live=absid > 0)
        f_rgb = jnp.where((absid > 0)[..., None], f_rgb, 1.0)
        cp = jnp.cumprod(f_rgb, axis=1)
        rad = jnp.sum(ctb * cp, axis=1)
        if return_factors:
            # Full per-lane deferred-factor product: the cross-phase
            # chaining term of the depth-phased render (render_fused_deep).
            return rad, cp[:, -1]
        return rad

    # Evaluate in fixed-size pieces: the texel graph (Perlin turbulence +
    # image-atlas gathers) makes the TPU compiler's time explode
    # superlinearly in lane count — ~40 s at 0.5M (B, D) lanes, hung >30 min
    # at 0.7M (tools probe, 2026-08-20). lax.map compiles the piece shape
    # once and loops; the work is bandwidth-bound either way.
    B = ctb.shape[0]
    piece = int(os.environ.get("RTW_COMBINE_PIECE", 1 << 15))
    if remat:
        # Differentiated combine (fused_diff deferred backward): without
        # rematerialization, vjp-of-lax.map stores every piece's texel
        # intermediates — measured 17.7 GB (> HBM) on earth 400x225x16 d8.
        combine = jax.checkpoint(combine)
    if B <= piece:
        return combine((ctb, dfr))
    n_p = -(-B // piece)
    pad = n_p * piece - B
    ctb_p = jnp.pad(ctb, ((0, pad), (0, 0), (0, 0)))
    dfr_p = jnp.pad(dfr, ((0, pad), (0, 0), (0, 0)))
    out = jax.lax.map(combine,
                      (ctb_p.reshape(n_p, piece, *ctb.shape[1:]),
                       dfr_p.reshape(n_p, piece, *dfr.shape[1:])))
    if return_factors:
        rad, fac = out
        return (rad.reshape(n_p * piece, 3)[:B],
                fac.reshape(n_p * piece, 3)[:B])
    return out.reshape(n_p * piece, 3)[:B]


def _combine_deferred_single(scene: SceneData, ctb: Array, dfr: Array):
    """Single-deferred-hit combine (SceneStatic.defer_single_hit): each
    path holds at most ONE live deferred record, so
    rad = sum_{k<k1} ctb_k + f * sum_{k>=k1} ctb_k with one texel fetch
    per lane — D fewer image gathers than the general cumprod combine
    (the gathers were ~92% of earth's frame; the record select below is
    elementwise, no gather at all)."""
    from raytracer_weekend_tpu import textures as tex_mod
    from raytracer_weekend_tpu.ops.sphere import sphere_uv

    code = jnp.round(dfr[..., 3]).astype(jnp.int32)       # (b, D)
    live = code > 0                                       # sphere records
    first = live & (jnp.cumsum(live.astype(jnp.int32), axis=1) == 1)
    any_l = live.any(axis=1)
    rec = jnp.sum(dfr * first[..., None], axis=1)         # (b, 4)
    texid = jnp.maximum(jnp.round(rec[..., 3]).astype(jnp.int32) - 1, 0)
    # Dead lanes: rec = 0; sphere_uv's atan2/asin Jacobian is NaN at the
    # zero vector — anchor them at a regular point (forward value is
    # masked below either way, but this function is differentiated by
    # fused_diff and 0 * NaN poisons the backward).
    abc = jnp.where(any_l[:, None], rec[..., 0:3], 0.5)
    u, v = sphere_uv(abc)
    f_rgb = tex_mod.texture_value(scene.textures, texid, u, v, abc,
                                  has_noise=False, has_image=True)
    f_rgb = jnp.where(any_l[:, None], f_rgb, 1.0)         # (b, 3)
    after = jnp.cumsum(first.astype(jnp.float32), axis=1)  # 1 from k1 on
    pre = jnp.sum(ctb * (1.0 - after)[..., None], axis=1)
    post = jnp.sum(ctb * after[..., None], axis=1)
    return pre + f_rgb * post


def _block_perm(cfg: RenderConfig, b_pad: int):
    """Block-tiling lane permutation (numpy, static): assigns each ray
    tile a ~8x8 pixel block instead of a width-wide scanline strip, so
    tile ray bundles are spatially tight (cull/frustum prepasses) and
    short-path tiles exit the depth loop early. Returns (perm, bw, bh)."""
    import numpy as _np

    spp_t = cfg.samples_per_pixel
    W, H = cfg.width, cfg.height

    def _near_divisor(n, target):
        divs = [d for d in range(1, n + 1) if n % d == 0]
        return min(divs, key=lambda d: abs(d - target))

    bw = _near_divisor(W, 8)
    bh = _near_divisor(H, 8)
    pp = (_np.arange(H * W, dtype=_np.int64)
          .reshape(H // bh, bh, W // bw, bw)
          .transpose(0, 2, 1, 3).ravel())               # block-major pixels
    perm_np = (pp[:, None] * spp_t
               + _np.arange(spp_t, dtype=_np.int64)[None, :]).ravel()
    if b_pad > perm_np.size:                            # dead tail: identity
        perm_np = _np.concatenate(
            [perm_np, _np.arange(perm_np.size, b_pad)])
    return perm_np, bw, bh



def _wide_of(x, n_tiles, lanes_l):
    """(b_pad,) -> (8, n_tiles*L), the kernel's (8, L) tile layout."""
    return x.reshape(n_tiles, 8, lanes_l).transpose(1, 0, 2).reshape(
        8, n_tiles * lanes_l)


def _tile_b(s_pad: int) -> int:
    """Ray-tile size for the (s_pad, TILE_B) intersection planes.

    Swept on TPU v5e (jumpy_balls, s_pad=512): 256->55.1M, 512->57.0M,
    1024->56.8M, 2048->59.6M seg/s; 4096 fails to compile (VMEM). Scale
    the swept best inversely with plane height, clamped to tested sizes.
    """
    env = os.environ.get("RTW_TILE_B")
    if env:
        return int(env)
    budget = 2048 * 512 // s_pad
    return int(max(256, min(2048, (budget // 128) * 128)))



def _derive_sizes(cfg: RenderConfig, S: int, n_planar: int,
                  has_sph: bool, has_planar: bool,
                  defer_tex: bool, emit_paths: bool,
                  tile_override, s_pad_override, r_chunk_override,
                  s_chunk_override, n_chunk: int):
    """Shared static-shape derivation for the fused kernel: s_pad/s_chunk,
    tile_b/b_pad, r_pad/r_chunk. Used by _render_fused_core AND the
    peeled-primary host prepass, which must mirror the core's tiling
    exactly (a drifted mirror would bind per-tile tables to the wrong
    pixel rects)."""
    s_pad = s_pad_override or _round_up(max(S, 128), 128)
    r_pad0 = _round_up(max(n_planar, 128), 128) if has_planar else 0
    if s_chunk_override is not None:
        s_chunk = s_chunk_override
    else:
        env_sc = os.environ.get("RTW_S_CHUNK")
        if env_sc is not None:
            s_chunk = int(env_sc)
        else:
            # Default ON above 1024 columns (book2-class clusters), where
            # the round-6 compacted condless walk (s_sec) skips whole
            # 128-wide chunks for rays that miss the cluster's AABBs.
            # Below that, every chunk-walk variant measured loses to the
            # unrolled full-table path on v5e (jumpy, r4: per-row foris
            # 37M, one tile-level cond fori 59M, vs 89M unchunked).
            s_chunk = 128 if s_pad >= 1024 else 0
    if s_chunk:
        s_pad = _round_up(s_pad, s_chunk)
    n_sch = (s_pad // s_chunk) if s_chunk else 1
    s_eff = s_chunk if n_sch > 1 else s_pad
    # (8, L) state needs tile_b = 8*L with L a lane multiple: tile % 1024.
    # Chunking bounds the per-chunk plane height, so tile sizing sees the
    # chunk, not the full primitive count: for chunked planar scenes the
    # live planes are (r_chunk, L), so the tile should NOT shrink with
    # r_pad0 (the round-1..3 sizing gave cow tile 1024/rc 256 = 12.3M
    # seg/s; tile 2048/rc 128 measures 15.2M, suspension 5.9 -> 9.7M,
    # monument 1080p 5.0 -> 4.1 s/frame — v5e, r4 sweep).
    planar_term = r_pad0 if r_pad0 <= 256 else 128
    tile_b = _round_up(tile_override
                       or _tile_b(max(s_eff, planar_term)), 1024)
    # Aux output blocks are (rows_per_depth * max_depth, L): bound their
    # VMEM share at ~4 MB by shrinking the ray tile for deep renders.
    aux_rows = (56 if defer_tex else 0) + (8 if emit_paths else 0)
    while (aux_rows and tile_b > 1024
           and aux_rows * cfg.max_depth * (tile_b // 8) * 4 > 4 * 2**20):
        tile_b -= 1024
    b_pad = _round_up(max(n_chunk, tile_b), tile_b)
    n_tiles, lanes_l = b_pad // tile_b, tile_b // 8
    # Planar chunk: bound the TOTAL live chunk-plane VMEM, not one plane.
    # Per chunk iteration ~14 (r_chunk, L) f32 planes are live at once: the
    # stacked matmul outputs (3rc, L) md + (4rc, L) mo plus t/u/v/flag/ok/
    # tneg and the running best planes. Round 1 budgeted only (rc, L) and
    # mesh scenes (cow 5.8k tris @ rc=2048, L=128 -> ~13 MB) failed to
    # compile on the real TPU (BENCH_NOTES.md). 32k f32 lanes per plane
    # (was 64k: the HIGHEST-precision intersection matmuls add bf16-split
    # temporaries, and 64k planes put mesh scenes ~1 MB over the 16 MB
    # scoped-VMEM limit) keeps the set near ~3.5 MB.
    if has_planar:
        r_chunk = r_chunk_override or max(
            128, min(r_pad0, (32768 // lanes_l) // 128 * 128))
        r_pad = _round_up(r_pad0, r_chunk)
    else:
        r_chunk = r_pad = 0
    return dict(s_pad=s_pad, s_chunk=s_chunk, n_sch=n_sch, s_eff=s_eff,
                tile_b=tile_b, b_pad=b_pad, n_tiles=n_tiles,
                lanes_l=lanes_l, r_pad0=r_pad0, r_pad=r_pad,
                r_chunk=r_chunk)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_chunk", "interpret",
                                    "tile_override", "s_pad_override",
                                    "r_chunk_override", "s_chunk_override",
                                    "ablate", "static",
                                    "defer_tex", "emit_paths",
                                    "emit_deferred", "p_k",
                                    "pp_k", "d0", "phase_in",
                                    "phase_out", "p_ovf", "pp_ovf"))
def _render_fused_core(scene: SceneData, cfg: RenderConfig, cam: Camera,
                 lane_start, n_chunk: int, seed,
                 interpret: bool = False,
                 tile_override: int | None = None,
                 s_pad_override: int | None = None,
                 r_chunk_override: int | None = None,
                 s_chunk_override: int | None = None,
                 ablate: str = "",
                 static: SceneStatic | None = None,
                 defer_tex: bool | None = None,
                 emit_paths: bool = False,
                 emit_deferred: bool = False,
                 ptab_full=None, ptab_int=None, p_k: int = 0,
                 ptab_pd=None, ptab_po=None, ptab_pg=None,
                 pp_k: int = 0,
                 state_in=None, rid_in=None, d0: int = 0,
                 phase_in: bool = False, phase_out: bool = False,
                 ptab_ovf=None, p_ovf: bool = False,
                 ptab_povf=None, pp_ovf: bool = False):
    """Render lanes [lane_start, lane_start + n_chunk) fully fused.

    Returns (radiance (n_chunk, 3) f32, segments (n_chunk,) int32) — per-lane
    radiance estimates (lane = pixel * spp + sample) and traced-segment
    counts. Caller accumulates lanes into the film.

    defer_tex (default: derived from static.has_noise/has_image) runs the
    kernel in deferred-texture mode: noise/image texels are applied outside
    the kernel with the staged path's exact texture code. With
    emit_paths=True additionally returns per-bounce winner codes
    (n_chunk, max_depth) f32 — the residuals for integrator.replay_rays'
    custom-VJP backward.
    """
    # Family presence: SceneStatic when given (builder pads empty families
    # with one invalid dummy row, so shapes alone can't prove absence).
    S = scene.spheres.radius.shape[0]
    Rn = scene.rects.axis.shape[0]
    Tn = scene.triangles.mat.shape[0]
    Vn = scene.volumes.vtype.shape[0]
    if static is not None:
        has_sph = static.n_spheres > 0
        with_rects = static.n_rects > 0
        with_tris = static.n_triangles > 0
        n_vol = static.n_volumes
    else:
        has_sph, with_rects, with_tris = S > 0, Rn > 0, Tn > 0
        n_vol = Vn
    has_planar = with_rects or with_tris
    n_planar = (Rn if with_rects else 0) + (Tn if with_tris else 0)
    if defer_tex is None:
        defer_tex = bool(static is not None
                         and (static.has_noise or static.has_image))
    sz = _derive_sizes(cfg, S, n_planar, has_sph, has_planar, defer_tex,
                       emit_paths, tile_override, s_pad_override,
                       r_chunk_override, s_chunk_override, n_chunk)
    s_pad, s_chunk, n_sch, s_eff = (sz["s_pad"], sz["s_chunk"],
                                    sz["n_sch"], sz["s_eff"])
    tile_b, b_pad = sz["tile_b"], sz["b_pad"]
    n_tiles, lanes_l = sz["n_tiles"], sz["lanes_l"]
    r_pad, r_chunk = sz["r_pad"], sz["r_chunk"]
    grid = (n_tiles,)
    # Over-cap planar scenes: tables stream from HBM per chunk instead of
    # living VMEM-resident (the caps in fused_supported; RTW_P_STREAM=1
    # forces it for any chunked scene — the synthetic bench/parity knob).
    p_stream = (has_planar and r_chunk and r_pad // r_chunk > 1
                and not ablate
                and (n_planar > 18432
                     or os.environ.get("RTW_P_STREAM") == "1"))

    tabs, tab_specs = [], []
    chunk_ks = False
    if has_sph:
        tab_full, tab_int = _build_table(
            scene, s_pad, s_chunk if n_sch > 1 else None)
        tabs += [tab_full, tab_int]
        tab_specs += [
            pl.BlockSpec((n_sch * 2 * P_ROWS, s_eff), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sch * 144, s_eff), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if n_sch > 1:
            svab_arr = _sphere_chunk_aabbs(scene, s_pad, s_chunk)
            tabs.append(svab_arr)
            tab_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            if ("noseccl" not in ablate and "nogather" not in ablate
                    and "nocull" not in ablate):
                # VMEM twin for the compacted-walk flags (s_sec).
                tabs.append(svab_arr)
                tab_specs.append(
                    pl.BlockSpec((n_sch, 8), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    if has_planar:
        n_ch = r_pad // r_chunk
        # K-split chunk tables: 3.5x the pd/po VMEM for 1-pass DEFAULT
        # matmuls; gated by r_pad so suspension-class meshes (17k prims,
        # ~14 MB of K-split tables) keep the HIGHEST layout.
        chunk_ks = n_ch > 1 and r_pad <= 8192 and not p_stream
        tab_pd, tab_po, tab_pg = _build_planar_tables(
            scene, r_pad, with_rects, with_tris, r_chunk,
            ksplit_chunks=chunk_ks)
        vab_arr = _planar_chunk_aabbs(scene, r_pad, r_chunk,
                                      with_rects, with_tris)
        tabs += [tab_pd, tab_po, tab_pg, vab_arr]
        pd_rows = 24 if n_ch == 1 else n_ch * (24 if chunk_ks else 8)
        po_rows = 32 if n_ch == 1 else n_ch * (32 if chunk_ks else 8)
        if p_stream:
            # Tables stay in HBM; the kernel DMAs one chunk's slabs into
            # VMEM scratch inside the cull cond (see _stream_walk).
            tab_specs += [
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ]
        else:
            tab_specs += [
                pl.BlockSpec((pd_rows, 3 * r_chunk), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((po_rows, 4 * r_chunk), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_ch * 2 * PG_ROWS, r_chunk),
                             lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ]
    if n_vol:
        tabs.append(_build_vol_par(scene))
        tab_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    par = _pack_par(scene, cam)
    ipar = jnp.stack([
        jnp.asarray(lane_start, jnp.int32),
        jnp.asarray(seed, jnp.uint32).astype(jnp.int32),
        jnp.asarray(n_chunk, jnp.int32),
        jnp.int32(0),
    ]).reshape(1, 4)

    # Per-lane film coordinates (bottom-up rows, _pixel_rays semantics),
    # computed with XLA int ops: Mosaic lacks i64 for div-by-constant.
    if phase_in:
        # Mid phases carry the ORIGINAL per-lane ids of the compacted
        # survivors (RNG keying); padded tail lanes ride dead (alive=0
        # in the padded state rows).
        lane = jnp.pad(jnp.asarray(rid_in, jnp.int32),
                       ((0, b_pad - rid_in.shape[0]),))
    else:
        lane = (jnp.asarray(lane_start, jnp.int32)
                + jnp.arange(b_pad, dtype=jnp.int32))

    # 2D-tiled ray order for the chunked planar path: assign each ray TILE a
    # Morton (Z-order) pixel block instead of a width-wide scanline strip
    # (e.g. an 8x8-pixel square at 16 spp), so the tile's ray bundle is
    # spatially tight and the per-chunk AABB cull actually prunes. Lane ids
    # (and so RNG streams, colrow, and the per-lane radiance) are carried
    # through the permutation — the image is bitwise identical, tiles just
    # cover different pixels. Single-chunk scenes skip it: no cull to help,
    # and the sort + unscramble gather would be pure overhead.
    # 2D block tiling applies on the full-frame call only (render_image
    # single-chunk and 1-device shard both pass lane_start = 0 there); the
    # chunked shard path keeps scanline order.
    n_chunks_st = (r_pad // r_chunk) if has_planar else 0
    # Tiling also engages for sphere-only scenes past trivial size:
    # coherent 2D pixel blocks let sky/short-path tiles exit the depth
    # loop early (+4.5% on jumpy, v5e r4) at ~0 runtime cost.
    block_tiling = ((n_chunks_st > 1 or n_sch > 1
                     or (has_sph and s_pad >= 384)
                     or "forcetile" in ablate)
                    and "notile" not in ablate
                    and not phase_in
                    and n_chunk == cfg.n_rays)
    if (p_k or pp_k) and not block_tiling:
        raise ValueError("peeled-primary tables require block tiling")
    if p_k and n_sch > 1:
        raise ValueError("sphere peel requires unchunked spheres")
    if pp_ovf and ("noclist" in ablate or p_stream):
        raise ValueError("planar peel overflow needs the primary chunk "
                         "lists (noclist/p_stream excluded)")
    # Condless compacted secondary chunk walk (round 6): per-row chunk
    # cull flags vectorized into one (C-1, L) slab test, flagged ids
    # compacted into SMEM, walked by a dynamic-trip fori with no cond in
    # the body. Replaces the serialized cond-per-chunk walk (~2K cycles
    # per fori iteration on v5e) everywhere the tables are VMEM-resident.
    sec_clist = (has_planar and n_chunks_st > 1 and not p_stream
                 and "noseccl" not in ablate
                 and "nogather" not in ablate
                 and "nocull" not in ablate)
    # not p_stream: the streaming scratch branch replaces the SMEM
    # compacted-list scratch with DMA semaphores, so the condless walk's
    # refs[-1] would misbind; over-cap planar scenes with >= 1024-column
    # sphere tables fall back to the cond-based sphere walk instead.
    s_sec = (has_sph and n_sch > 1 and not p_stream
             and "noseccl" not in ablate
             and "nogather" not in ablate
             and "nocull" not in ablate)
    if block_tiling:
        # The permutation depends only on static shape config, so build it
        # in numpy at trace time — it enters the graph as a constant, and
        # colrow/rid below are derived from it with elementwise ops.
        # (Runtime variants measured on v5e at 1.44M lanes: per-lane
        # argsort ~35 ms/frame, per-pixel sort + scatter/gather expansion
        # ~80 ms — XLA TPU scatter/gather at million-scale costs tens of
        # ms, wiping out the cull win. This version adds ~0 runtime.)
        import numpy as _np

        perm_np, bw, bh = _block_perm(cfg, b_pad)
        lane = (jnp.asarray(lane_start, jnp.int32)
                + jnp.asarray(perm_np, jnp.int32))

    pix = lane // cfg.samples_per_pixel
    col_f = (pix % cfg.width).astype(jnp.float32)
    row_f = (cfg.height - 1 - pix // cfg.width).astype(jnp.float32)

    def _wide(x):  # (b_pad,) -> (8, n_tiles*L): ray s*L+c of tile i at
        # (s, i*L+c), matching the kernel's (8, L) layout.
        return x.reshape(n_tiles, 8, lanes_l).transpose(1, 0, 2).reshape(
            8, n_tiles * lanes_l)

    colrow = jnp.concatenate([_wide(col_f), _wide(row_f)], axis=0)  # (16, .)
    ridp = _wide(lane)                                   # (8, .) int32

    # Primary-frustum chunk-list compaction: under block tiling each ray
    # tile covers a STATIC pixel rectangle, so a host prepass intersects the
    # tile's bounce-0 frustum (4 corner-ray planes through the camera
    # origin, jitter-padded pixel rect, lens-radius margin) with every
    # chunk AABB and hands the kernel a per-tile compacted chunk-id list
    # for the primary bounce — most segments are primaries, and a 64-pixel
    # tile typically sees 1-2 of the mesh's chunks. The in-kernel slab cull
    # still prunes the remaining (secondary) full walks. Conservative by
    # construction: planes pass through the origin with inward normals;
    # any primary ray point satisfies dot(n, x - o) >= -lens_radius.
    primary_clist = (block_tiling and "noclist" not in ablate
                     and not p_stream)
    if primary_clist:
        spp_c = cfg.samples_per_pixel
        W, H = cfg.width, cfg.height
        tp = perm_np[:n_tiles * tile_b].reshape(n_tiles, tile_b) // spp_c
        tp = _np.minimum(tp, cfg.n_pixels - 1)
        tpx, tpy = tp % W, tp // W
        s_lo = jnp.asarray(tpx.min(1) / (W - 1), jnp.float32)
        s_hi = jnp.asarray((tpx.max(1) + 1) / (W - 1), jnp.float32)
        t_lo = jnp.asarray((H - 1 - tpy.max(1)) / (H - 1), jnp.float32)
        t_hi = jnp.asarray((H - tpy.min(1)) / (H - 1), jnp.float32)
        base = (cam.lower_left - cam.origin)[None, :]

        def _dirc(s, t):
            return (base + s[:, None] * cam.horizontal[None, :]
                    + t[:, None] * cam.vertical[None, :])

        d00 = _dirc(s_lo, t_lo)
        d10 = _dirc(s_hi, t_lo)
        d11 = _dirc(s_hi, t_hi)
        d01 = _dirc(s_lo, t_hi)
        dc = d00 + d10 + d11 + d01
        # Defocus margin must grow with chunk distance: a lens ray deviates
        # from the pinhole frustum by |e|*|t/focus - 1| (e = lens offset),
        # which exceeds lens_radius beyond 2x the focus distance (ADVICE r3
        # medium: animated_book2's aperture-1.0 camera with ground boxes at
        # ~2x focus could wrongly cull primary chunks). The viewport center
        # lies ON the focus plane (camera.rs:47-52 / camera.py:59-61), so
        # focus_dist = |center - origin|; bound t by the farthest AABB
        # corner distance per chunk.
        vp_center = (cam.lower_left + 0.5 * cam.horizontal
                     + 0.5 * cam.vertical)
        focus_d = jnp.maximum(jnp.linalg.norm(vp_center - cam.origin), 1e-6)

        def _mk_ctab(ab_arr, include0=False):
            # (C, 8) chunk AABBs -> (T, 1, C[+1]) SMEM [count, chunk
            # ids...] per tile (chunk 0 excluded — always walked
            # statically — unless include0: the peeled-primary overflow
            # walk has no static chunk-0 pass, so its lists cover all
            # overlapping chunks).
            lo_c = ab_arr[:, 0:3]                    # (C, 3)
            hi_c = ab_arr[:, 3:6]
            far_sq = sum(
                jnp.maximum(jnp.abs(lo_c[:, j] - cam.origin[j]),
                            jnp.abs(hi_c[:, j] - cam.origin[j])) ** 2
                for j in range(3))
            defocus_r = cam.lens_radius * jnp.maximum(
                1.0, jnp.sqrt(far_sq) / focus_d)     # (C,)
            ov = None
            for da, db in ((d00, d10), (d10, d11), (d11, d01), (d01, d00)):
                nrm = jnp.cross(da, db)              # (T, 3)
                nrm = nrm * jnp.sign(jnp.sum(nrm * dc, axis=1,
                                             keepdims=True))
                nn = jnp.linalg.norm(nrm, axis=1)
                maxdot = sum(
                    jnp.maximum(nrm[:, j:j + 1] * lo_c[None, :, j],
                                nrm[:, j:j + 1] * hi_c[None, :, j])
                    for j in range(3))               # (T, C)
                maxdot = maxdot - jnp.sum(nrm * cam.origin[None, :],
                                          axis=1, keepdims=True)
                margin = ((defocus_r[None, :] + 1e-3) * nn[:, None]
                          + 1e-6)                    # (T, C)
                okp = (maxdot >= -margin) | (nn < 1e-12)[:, None]
                ov = okp if ov is None else (ov & okp)
            off = 0 if include0 else 1
            ov = ov[:, off:]
            # Front-to-back order (by nearest-AABB-corner distance from the
            # camera): the walk's `en < tcur` test then occlusion-prunes
            # back chunks once front hits land.
            near_sq = sum(
                jnp.maximum(jnp.maximum(lo_c[:, j] - cam.origin[j],
                                        cam.origin[j] - hi_c[:, j]),
                            0.0) ** 2
                for j in range(3))[off:]             # (C-off,)
            key = jnp.where(ov, near_sq[None, :], jnp.inf)
            order = jnp.argsort(key, axis=1)
            return jnp.concatenate(
                [jnp.sum(ov, axis=1, dtype=jnp.int32)[:, None],
                 (order + off).astype(jnp.int32)], axis=1)[:, None, :]
            # (T, 1, n_ch): SMEM blocks need the last two dims to equal
            # the array dims, so the tile axis leads.

        ctab = (_mk_ctab(vab_arr, include0=pp_ovf)
                if (n_chunks_st > 1 and primary_clist
                    and (not sec_clist or pp_ovf)) else None)
        ctab_s = (_mk_ctab(svab_arr)
                  if n_sch > 1 and not s_sec else None)

    kernel = functools.partial(
        _kernel, width=cfg.width, height=cfg.height,
        spp=cfg.samples_per_pixel, max_depth=cfg.max_depth,
        t_min=cfg.t_min, tile_b=tile_b, r_pad=r_pad, r_chunk=r_chunk,
        s_pad=s_pad, s_chunk=s_chunk,
        has_sph=has_sph, has_planar=has_planar, n_vol=n_vol, ablate=ablate,
        defer_tex=defer_tex, emit_paths=emit_paths,
        primary_clist=primary_clist, p_k=p_k, pp_k=pp_k,
        d0=d0, phase_in=phase_in, phase_out=phase_out, p_ovf=p_ovf,
        pp_ovf=pp_ovf, sec_clist=sec_clist, s_sec=s_sec,
        chunk_ks=chunk_ks, p_stream=p_stream)

    D = cfg.max_depth
    out_specs = [
        pl.BlockSpec((24, lanes_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, lanes_l), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((24, n_tiles * lanes_l), jnp.float32),
        jax.ShapeDtypeStruct((8, n_tiles * lanes_l), jnp.float32),
    ]
    if defer_tex:
        for rows in (24 * D, 32 * D):
            out_specs.append(pl.BlockSpec((rows, lanes_l), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(
                jax.ShapeDtypeStruct((rows, n_tiles * lanes_l), jnp.float32))
    if emit_paths:
        out_specs.append(pl.BlockSpec((8 * D, lanes_l), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((8 * D, n_tiles * lanes_l), jnp.float32))
    if phase_out:
        out_specs.append(pl.BlockSpec((120, lanes_l), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((120, n_tiles * lanes_l), jnp.float32))
    if phase_in:
        sti = jnp.pad(jnp.asarray(state_in, jnp.float32),
                      ((0, b_pad - state_in.shape[0]), (0, 0)))
        stin_planes = jnp.concatenate(
            [_wide_of(sti[:, c], n_tiles, lanes_l) for c in range(15)],
            axis=0)                                  # (120, n_tiles*L)

    # Slab the grid: the TPU compile helper crashes once a call's total
    # output elements pass ~10-60M (book2 defer_tex at frame-scale grids;
    # nodefer kernels with 32 output rows are fine to >1400 tiles —
    # bisected on-chip, tools/perf_r2{d,g}.py). Splitting into same-shape
    # calls costs one compile + per-call dispatch only.
    rows_out = sum(s.shape[0] for s in out_shapes)
    budget = int(os.environ.get("RTW_SLAB_ELEMS", 8 << 20))
    slab_tiles = max(1, min(n_tiles, budget // (rows_out * lanes_l)))
    n_slabs = -(-n_tiles // slab_tiles)

    # Tile-indexed side tables (per-tile peel tables, frustum chunk
    # lists) ride with the tile-indexed inputs: their block index is the
    # tile id, which restarts at 0 per slab, so each is sliced per slab.
    # Entries are (final_pos, spec, full_array, slab_slicer) with
    # final_pos in the KERNEL's ref coordinate system; processing in
    # ascending order makes list.insert land every entry at exactly its
    # final index.
    ins = []

    def _tile_sl(a, g0, gk):
        return a[g0:g0 + gk]

    def _col_sl(w):
        def sl(a, g0, gk):
            return a[:, g0 * w:(g0 + gk) * w]
        return sl

    def _vm_spec(rows, w):
        return pl.BlockSpec((rows, w), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def _ct_spec(n_ch_c):
        return pl.BlockSpec((1, 1, n_ch_c), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    # Walk the kernel's ref order, tracking the final position cursor.
    fpos = 0
    if has_sph:
        fpos += 2                                    # tab_full, tab_int
        if p_k:
            ins.append((fpos, _vm_spec(2 * P_ROWS, p_k), ptab_full,
                        _col_sl(p_k)))
            ins.append((fpos + 1, _vm_spec(144, p_k), ptab_int,
                        _col_sl(p_k)))
            fpos += 2
            if p_ovf:
                ins.append((fpos, _ct_spec(1), ptab_ovf, _tile_sl))
                fpos += 1
        if n_sch > 1:
            fpos += 1                                # svab
            if s_sec:
                fpos += 1                            # svabv (in tabs)
            elif primary_clist:
                ins.append((fpos, _ct_spec(n_sch), ctab_s, _tile_sl))
                fpos += 1
    if has_planar:
        fpos += 4                                    # pd, po, pg, vab
        if pp_k:
            ins.append((fpos, _vm_spec(24, 3 * pp_k), ptab_pd,
                        _col_sl(3 * pp_k)))
            ins.append((fpos + 1, _vm_spec(32, 4 * pp_k), ptab_po,
                        _col_sl(4 * pp_k)))
            ins.append((fpos + 2, _vm_spec(2 * PG_ROWS, pp_k), ptab_pg,
                        _col_sl(pp_k)))
            fpos += 3
            if pp_ovf:
                ins.append((fpos, _ct_spec(1), ptab_povf, _tile_sl))
                fpos += 1
        if sec_clist:
            # VMEM twin of the SMEM chunk AABBs for the vectorized
            # secondary cull flags (same array, not tile-indexed).
            ins.append((fpos,
                        pl.BlockSpec((n_chunks_st, 8), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        vab_arr, lambda a, g0, gk: a))
            fpos += 1
        if (primary_clist and n_chunks_st > 1
                and (not sec_clist or pp_ovf)):
            ins.append((fpos,
                        _ct_spec(n_chunks_st + (1 if pp_ovf else 0)),
                        ctab, _tile_sl))
            fpos += 1
    ins.sort(key=lambda t: t[0])

    def call_slab(colrow_k, rid_k, g0, gk):
        tabs_k, specs_k = list(tabs), list(tab_specs)
        for pos, spec, arr, sl in ins:
            tabs_k.insert(pos, sl(arr, g0, gk))
            specs_k.insert(pos, spec)
        st_in = ([pl.BlockSpec((120, lanes_l), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
                 if phase_in else [])
        st_arg = ([stin_planes[:, g0 * lanes_l:(g0 + gk) * lanes_l]]
                  if phase_in else [])
        return pl.pallas_call(
            kernel,
            grid=(gk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((16, lanes_l), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, lanes_l), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                *st_in,
                *specs_k,
            ],
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((s.shape[0], gk * lanes_l),
                                            s.dtype) for s in out_shapes],
            scratch_shapes=(
                [pltpu.VMEM((8, 3 * r_chunk), jnp.float32),
                 pltpu.VMEM((8, 4 * r_chunk), jnp.float32),
                 pltpu.VMEM((2 * PG_ROWS, r_chunk), jnp.float32),
                 pltpu.SemaphoreType.DMA,
                 pltpu.SemaphoreType.DMA,
                 pltpu.SemaphoreType.DMA] if p_stream else
                (([pltpu.SMEM((8, n_chunks_st + 8), jnp.int32)]
                  if sec_clist else [])
                 + ([pltpu.SMEM((1, n_sch + 8), jnp.int32)]
                    if s_sec else []))),
            cost_estimate=pl.CostEstimate(
                flops=cfg.max_depth * (gk * tile_b) * (s_pad + r_pad) * 40,
                bytes_accessed=(4 * gk * tile_b * 4) + P_ROWS * s_pad * 4,
                transcendentals=cfg.max_depth * (gk * tile_b) * 24,
            ),
            interpret=interpret,
        )(par, ipar, colrow_k, rid_k, *st_arg, *tabs_k)

    if n_slabs == 1:
        rad, seg, *aux = call_slab(colrow, ridp, 0, n_tiles)
    else:
        outs = []
        for k in range(n_slabs):
            g0 = k * slab_tiles
            gk = min(slab_tiles, n_tiles - g0)
            # Lane validity is per-lane (the kernel checks the loaded id
            # against the global window), so slabs just slice the planes.
            colrow_k = colrow[:, g0 * lanes_l:(g0 + gk) * lanes_l]
            rid_k = ridp[:, g0 * lanes_l:(g0 + gk) * lanes_l]
            outs.append(call_slab(colrow_k, rid_k, g0, gk))
        # Tiles are independent; concatenating slab outputs along the lane
        # axis reassembles the full (rows, n_tiles*L) planes in tile order.
        rad, seg, *aux = (jnp.concatenate(parts, axis=1)
                          for parts in zip(*outs))

    # Undo the (8, L) tile layout: ray r of tile i lives at (sublane r // L,
    # lane r % L), so (rows, G*L) planes unscramble as (tile, sublane, lane).
    def _unlane(x, *chans):  # (prod(chans)*8, G*L) -> (b_pad, *chans)
        x = x.reshape(*chans, 8, n_tiles, lanes_l)
        perm = (len(chans) + 1, len(chans), len(chans) + 2,
                *range(len(chans)))
        return x.transpose(*perm).reshape(b_pad, *chans)

    rad = _unlane(rad, 3)
    seg = _unlane(seg).astype(jnp.int32)
    if defer_tex:
        # The deferred combine is per-lane elementwise — run it in position
        # order (pre-unscramble) so only the small final planes pay the
        # unscramble gather.
        ctb = _unlane(aux[0], D, 3)
        dfr = _unlane(aux[1], D, 4)
        if static is not None and static.defer_single_hit and not phase_out:
            rad = _combine_deferred_single(scene, ctb, dfr)
        else:
            rad = _combine_deferred(
                scene, ctb, dfr,
                has_noise=static.has_noise if static else True,
                has_image=static.has_image if static else True,
                pallas_noise=not interpret,
                return_factors=phase_out)
        if phase_out:
            rad, defer_factors = rad
    if phase_out:
        state_out = _unlane(aux[-1], 15)
        aux = aux[:-1]
    if emit_paths:
        codes = _unlane(aux[-1], D)
    if block_tiling:
        # Undo the block permutation with pure reshape/transpose (the
        # block order is a transpose pattern, so no gather is needed).
        def _untile(x):
            chans = x.shape[1:]
            body = x[:cfg.n_rays].reshape(
                cfg.height // bh, cfg.width // bw, bh, bw,
                cfg.samples_per_pixel, *chans)
            body = body.transpose(0, 2, 1, 3,
                                  *range(4, 5 + len(chans)))
            return body.reshape(cfg.n_rays, *chans)

        rad = _untile(rad)
        seg = _untile(seg)
        if emit_paths:
            codes = _untile(codes)
        if emit_deferred and defer_tex:
            ctb = _untile(ctb)
            dfr = _untile(dfr)
        if phase_out:
            state_out = _untile(state_out)
            if defer_tex:
                defer_factors = _untile(defer_factors)
    outs = [rad[:n_chunk], seg[:n_chunk]]
    if emit_paths:
        outs.append(codes[:n_chunk])
    if emit_deferred and defer_tex:
        # Raw per-bounce deferred-texture records (kernel shaded the
        # texel as 1.0): ctb (n, D, 3) radiance contributions and dfr
        # (n, D, 4) = (a, b, c, code) — the fused replay backward's
        # residuals (fused_diff deferred path).
        outs.append(ctb[:n_chunk])
        outs.append(dfr[:n_chunk])
    if phase_out:
        outs.append(state_out[:n_chunk])
        if defer_tex:
            outs.append(defer_factors[:n_chunk])
    return tuple(outs)


# --------------------------------------------------------------------------
# Peeled-primary host prepass (public render_fused wrapper)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("s_pad",))
def _gather_peel_tables(scene: SceneData, idx, s_pad: int):
    tf, ti = _build_table(scene, s_pad)
    flat = idx.reshape(-1)
    return tf[:, flat], ti[:, flat]


@functools.partial(jax.jit, static_argnames=("r_pad", "with_rects",
                                             "with_tris"))
def _gather_peel_planar(scene: SceneData, idx, r_pad: int,
                        with_rects: bool, with_tris: bool):
    """Per-tile planar tables in the K-split single-chunk layout:
    pd (24, 3*r_pad) blocks [n|ua|ub], po (32, 4*r_pad)
    [num|u0|v0|flag], pg (2PG, r_pad). Gathers columns per block into
    (24, T*3K) / (32, T*4K) / (2PG, T*K) tile-major layouts, so the
    peeled primary bounce runs ONE DEFAULT-precision pass instead of
    the chunked walk's 6-pass HIGHEST matmuls."""
    pd, po, pg = _build_planar_tables(scene, r_pad, with_rects, with_tris,
                                      r_chunk=r_pad)
    T, K = idx.shape
    flat = idx.reshape(-1)

    def blocks(tab, nblk):
        cols = jnp.stack([tab[:, b * r_pad + flat] for b in range(nblk)],
                         axis=2)                      # (rows, T*K, nblk)
        return (cols.reshape(tab.shape[0], T, K, nblk)
                .transpose(0, 1, 3, 2)
                .reshape(tab.shape[0], T * nblk * K))

    return blocks(pd, 3), blocks(po, 4), pg[:, flat].reshape(
        2 * PG_ROWS, T * K)


_PEEL_CACHE: dict = {}


def _peel_primary_tables(scene: SceneData, static: SceneStatic,
                         cfg: RenderConfig, cam: Camera,
                         n_chunk: int, tile_override,
                         defer_tex: bool = False,
                         emit_paths: bool = False):
    """Per-tile frustum-compacted primary tables for the peeled bounce 0.

    Host prepass on CONCRETE arrays (the top-level render path): under
    block tiling each ray tile covers a static pixel rect, so the tile's
    primary rays can only hit primitives whose (swept) AABB intersects
    the tile frustum (4 corner planes through the camera origin, defocus
    margin scaled by distance — same conservative test as the in-jit
    chunk-list prepass). Each tile gets its own K-column slice of the
    coefficient/gather tables (K = max per-tile count, padded with an
    always-invalid column), so the statically peeled primary bounce
    intersects K instead of s_pad/r_pad primitives with zero in-kernel
    control flow. Spheres (K-split tables) and planar rect/triangle sets
    (raw HIGHEST tables) peel independently; returns a kwargs dict for
    _render_fused_core (possibly empty) or None when nothing peels.
    """
    import numpy as np

    S = scene.spheres.radius.shape[0]
    has_sph = static.n_spheres > 0
    wr, wt = static.n_rects > 0, static.n_triangles > 0
    has_planar = wr or wt
    n_planar = ((scene.rects.axis.shape[0] if wr else 0)
                + (scene.triangles.mat.shape[0] if wt else 0))

    s_pad_ov = None
    # Upper bound 960: at >= 1024 columns the core defaults to the
    # chunked compacted sphere walk (s_sec), which excludes the peel.
    sphere_peel = has_sph and 384 <= _round_up(max(S, 128), 128) <= 960
    if sphere_peel:
        s_pad_ov = _round_up(max(S, 128), 128)
        if s_pad_ov <= S:
            s_pad_ov += 128    # guarantee an always-invalid pad column
    sz = _derive_sizes(cfg, S, n_planar, has_sph, has_planar, defer_tex,
                       emit_paths, tile_override, s_pad_ov, None, None,
                       n_chunk)
    tile_b, b_pad, n_tiles = sz["tile_b"], sz["b_pad"], sz["n_tiles"]
    r_pad, r_chunk = sz["r_pad"], sz["r_chunk"]
    planar_peel = (has_planar and r_chunk and r_pad // r_chunk > 1
                   and r_pad > n_planar and r_pad <= 32768
                   and n_planar <= 18432          # p_stream takes over
                   and os.environ.get("RTW_P_STREAM") != "1")
    if not sphere_peel and not planar_peel:
        return None

    sp, rc_, tr = scene.spheres, scene.rects, scene.triangles
    key = (id(sp.c0), id(rc_.k), id(tr.v0), id(cam.origin), cfg,
           n_chunk, s_pad_ov, tile_b, r_pad)
    hit = _PEEL_CACHE.get(key)
    if hit is not None:
        return hit[0]

    perm_np, _, _ = _block_perm(cfg, b_pad)
    spp = cfg.samples_per_pixel
    W, H = cfg.width, cfg.height
    tp = perm_np[:n_tiles * tile_b].reshape(n_tiles, tile_b) // spp
    tp = np.minimum(tp, cfg.n_pixels - 1)
    tpx, tpy = tp % W, tp // W
    s_lo = tpx.min(1) / (W - 1)
    s_hi = (tpx.max(1) + 1) / (W - 1)
    t_lo = (H - 1 - tpy.max(1)) / (H - 1)
    t_hi = (H - tpy.min(1)) / (H - 1)
    org = np.asarray(cam.origin, np.float64)
    ll = np.asarray(cam.lower_left, np.float64)
    hz = np.asarray(cam.horizontal, np.float64)
    vt = np.asarray(cam.vertical, np.float64)
    lr = float(np.asarray(cam.lens_radius))
    base = (ll - org)[None, :]

    def dirc(sv, tv):
        return base + sv[:, None] * hz[None, :] + tv[:, None] * vt[None, :]

    d00 = dirc(s_lo, t_lo)
    d10 = dirc(s_hi, t_lo)
    d11 = dirc(s_hi, t_hi)
    d01 = dirc(s_lo, t_hi)
    dc = d00 + d10 + d11 + d01
    vp_center = ll + 0.5 * hz + 0.5 * vt
    focus_d = max(float(np.linalg.norm(vp_center - org)), 1e-6)

    def overlap(lo, hi, valid):
        """(T, N) conservative tile-frustum x AABB overlap (defocus
        margin scaled by distance — see the in-jit _mk_ctab comment)."""
        lo = np.where(valid[:, None], lo, 0.0)   # 0 avoids inf*0 NaNs
        hi = np.where(valid[:, None], hi, 0.0)
        far = np.sqrt((np.maximum(np.abs(lo - org), np.abs(hi - org))
                       ** 2).sum(1))
        defocus_r = lr * np.maximum(1.0, far / focus_d)     # (N,)
        ov = None
        for da, db in ((d00, d10), (d10, d11), (d11, d01), (d01, d00)):
            nrm = np.cross(da, db)                          # (T, 3)
            nrm = nrm * np.sign((nrm * dc).sum(1, keepdims=True))
            nn = np.linalg.norm(nrm, axis=1)
            maxdot = sum(np.maximum(nrm[:, j:j + 1] * lo[None, :, j],
                                    nrm[:, j:j + 1] * hi[None, :, j])
                         for j in range(3))                 # (T, N)
            maxdot = maxdot - (nrm * org[None, :]).sum(1, keepdims=True)
            margin = (defocus_r[None, :] + 1e-3) * nn[:, None] + 1e-6
            okp = (maxdot >= -margin) | (nn < 1e-12)[:, None]
            ov = okp if ov is None else (ov & okp)
        return ov & valid[None, :]

    def lists(ov, pad_idx, cap, allow_overflow=False, ovf_ks=(128,)):
        counts = ov.sum(1)
        K = int(_round_up(max(int(counts.max()), 1), 128))
        ovf = None
        if allow_overflow and K > ovf_ks[0]:
            # K is set by outlier tiles (jumpy: 1/704 tiles at 130 vs a
            # median of 5; cow: p95 = 200 of 5856): clamp to the smallest
            # candidate K covering >= 95% of tiles and flag the outliers —
            # flagged tiles fall back to the full table (spheres: one cond
            # around the peeled block; planar: chunk-list walk with trip
            # count 0 for in-budget tiles).
            for kk in ovf_ks:
                if kk < K and (counts > kk).mean() <= 0.05:
                    K = kk
                    ovf = ((counts > kk).astype(np.int32)
                           .reshape(n_tiles, 1, 1))
                    break
        # Peel only when the compacted set is materially smaller than the
        # full table (otherwise the peel instance just duplicates code
        # and VMEM: book2's sphere cluster spans most tile frusta, and
        # its K-wide per-tile tables pushed the kernel over the VMEM
        # budget — compile-helper HTTP 500, r4).
        if K > cap // 2 or K > 1024:
            return None, None, None
        idx = np.full((n_tiles, K), pad_idx, np.int32)
        for t in range(n_tiles):
            w = np.nonzero(ov[t])[0]
            idx[t, :min(w.size, K)] = w[:K]
        return idx, K, ovf

    out = {}
    if sphere_peel:
        c0 = np.asarray(sp.c0, np.float64)
        c1 = np.asarray(sp.c1, np.float64)
        r = np.abs(np.asarray(sp.radius, np.float64))[:, None]
        valid = np.asarray(sp.valid)
        idx, K, ovf = lists(overlap(np.minimum(c0, c1) - r,
                                    np.maximum(c0, c1) + r, valid),
                            s_pad_ov - 1, s_pad_ov, allow_overflow=True)
        if idx is not None:
            ptf, pti = _gather_peel_tables(scene, jnp.asarray(idx),
                                           s_pad_ov)
            out.update(ptab_full=ptf, ptab_int=pti, p_k=K,
                       s_pad_override=s_pad_ov)
            if ovf is not None:
                out.update(ptab_ovf=jnp.asarray(ovf), p_ovf=True)
    if planar_peel:
        los, his, vals = [], [], []
        if wr:
            ax = np.asarray(rc_.axis)
            eye = np.eye(3)
            a_ax = np.where(ax == 0, 1, 0)
            b_ax = np.where(ax == 2, 1, 2)
            k_ = np.asarray(rc_.k, np.float64)
            a0 = np.asarray(rc_.a0, np.float64)
            a1 = np.asarray(rc_.a1, np.float64)
            b0 = np.asarray(rc_.b0, np.float64)
            b1 = np.asarray(rc_.b1, np.float64)
            pad = 1e-4      # rectangular.rs thin-slab padding
            lo = (eye[ax] * (k_ - pad)[:, None]
                  + eye[a_ax] * np.minimum(a0, a1)[:, None]
                  + eye[b_ax] * np.minimum(b0, b1)[:, None])
            hi = (eye[ax] * (k_ + pad)[:, None]
                  + eye[a_ax] * np.maximum(a0, a1)[:, None]
                  + eye[b_ax] * np.maximum(b0, b1)[:, None])
            los.append(lo)
            his.append(hi)
            vals.append(np.asarray(rc_.valid))
        if wt:
            v0 = np.asarray(tr.v0, np.float64)
            v1 = np.asarray(tr.v1, np.float64)
            v2 = np.asarray(tr.v2, np.float64)
            los.append(np.minimum(np.minimum(v0, v1), v2))
            his.append(np.maximum(np.maximum(v0, v1), v2))
            vals.append(np.asarray(tr.valid))
        lo = np.concatenate(los, axis=0)
        hi = np.concatenate(his, axis=0)
        valid = np.concatenate(vals, axis=0)
        if out:
            # Both families eligible (book2-class): the dual per-tile peel
            # tables pushed the kernel over the v5e VMEM budget in r4 —
            # keep the sphere peel only. (Scenes whose SPHERE peel is
            # rejected by lists() — e.g. a cluster spanning most frusta —
            # still get the planar peel.)
            idx = None
        else:
            # VMEM cap on the per-tile peel block (24*3K + 32*4K + 2PG*K
            # f32): ~1.2 MB at K=1024 blew the 16 MB scoped limit for
            # sphere+planar scenes at small test shapes (few tiles see
            # everything). 512 when the resident sphere tables are small
            # (cow carries 1 utility sphere); 128 alongside big ones
            # (book2's 1152-wide cluster planes).
            cap_k = 512 if _round_up(max(S, 128), 128) <= 384 else 128
            idx, K, povf = lists(overlap(lo, hi, valid), r_pad - 1, r_pad,
                                 allow_overflow=True,
                                 ovf_ks=(128, 256, 384, 512))
            if idx is not None and K > cap_k:
                idx = None
        if idx is not None:
            ppd, ppo, ppg = _gather_peel_planar(scene, jnp.asarray(idx),
                                                r_pad, wr, wt)
            out.update(ptab_pd=ppd, ptab_po=ppo, ptab_pg=ppg, pp_k=K)
            if povf is not None:
                out.update(ptab_povf=jnp.asarray(povf), pp_ovf=True)
    if not out:
        out = None
    # Strong refs to the source arrays pin their ids while cached (an
    # id-keyed cache would otherwise alias recycled buffers).
    _PEEL_CACHE[key] = (out, (sp.c0, rc_.k, tr.v0, cam.origin))
    while len(_PEEL_CACHE) > 16:
        _PEEL_CACHE.pop(next(iter(_PEEL_CACHE)))
    return out


def render_fused_deep(scene: SceneData, cfg: RenderConfig, cam: Camera,
                      lane_start, n_chunk: int, seed,
                      static: SceneStatic, phase_len: int = 10,
                      interpret: bool = False, peel_kw=None,
                      min_bucket: int = 1024):
    """Depth-phased fused render with stream compaction between phases.

    SURVEY §5.7's missing piece (lib.rs:97-117 attrition): the single-pass
    kernel's while_loop runs a tile until its LAST lane dies — at depth 50
    the reference criterion config traces at ~11% slot occupancy. This
    driver splits the depth range into phases of `phase_len` bounces; the
    kernel emits per-lane state, the host counts survivors (one device
    sync per phase), gathers live lanes into a power-of-two bucket (so
    recompiles amortize across runs), and resumes the next phase on the
    compacted set. Per-lane results are bitwise-identical to the
    single-pass render: the counter-based RNG keys on (lane id, absolute
    depth), so a lane's path does not depend on its batch position.

    Deferred noise/image texels chain across phases as
    total = sum_p (prod_{q<p} F_q) * R_p with per-phase combine results
    R_p and full factor products F_p, scattered back to original lane
    slots each phase.
    """
    import dataclasses as _dc

    import numpy as np

    D = cfg.max_depth
    defer = bool(static.has_noise or static.has_image)
    n = n_chunk
    rad_bank = jnp.zeros((n, 3), jnp.float32)
    seg_bank = jnp.zeros((n,), jnp.int32)
    gids = jnp.arange(n, dtype=jnp.int32)
    rid = jnp.asarray(int(lane_start) + np.arange(n, dtype=np.int32))
    R_cum = jnp.zeros((n, 3), jnp.float32)
    F_cum = jnp.ones((n, 3), jnp.float32)
    state = None
    cur_n = n
    d0 = 0
    while d0 < D:
        P = min(phase_len, D - d0)
        cfgp = _dc.replace(cfg, max_depth=P)
        if state is None:
            res = _render_fused_core(scene, cfgp, cam, lane_start, cur_n,
                                     seed, interpret=interpret,
                                     static=static, phase_out=True,
                                     **(peel_kw or {}))
        else:
            res = _render_fused_core(scene, cfgp, cam, 0, cur_n, seed,
                                     interpret=interpret, static=static,
                                     state_in=state, rid_in=rid, d0=d0,
                                     phase_in=True, phase_out=True)
        if defer:
            rad_p, _, st, F_p = res
        else:
            rad_p, _, st = res
            F_p = None
        # Cumulative per-lane totals banked into ORIGINAL lane slots.
        if defer:
            R_tot = R_cum + F_cum * rad_p
        else:
            # non-defer: the kernel's radiance rides in state and is
            # already cumulative across phases.
            R_tot = rad_p
        rad_bank = rad_bank.at[gids].set(R_tot)
        seg_bank = seg_bank.at[gids].set(
            jnp.round(st[:, 14]).astype(jnp.int32))
        d0 += P
        if d0 >= D:
            break
        alive = st[:, 13] > 0.0
        live = int(jnp.sum(alive))          # one host sync per phase
        if live == 0:
            break
        bucket = max(min_bucket, 1 << (live - 1).bit_length())
        bucket = min(bucket, cur_n)
        if bucket < cur_n:
            order = jnp.argsort(jnp.where(alive, 0, 1).astype(jnp.int32),
                                stable=True)
            sel = order[:bucket]
            st = st[sel]
            rid = rid[sel]
            gids = gids[sel]
            if defer:
                R_cum = R_tot[sel]
                F_cum = (F_cum * F_p)[sel]
        else:
            if defer:
                R_cum = R_tot
                F_cum = F_cum * F_p
        state = st
        cur_n = int(st.shape[0])
    return rad_bank, seg_bank


def render_fused(scene: SceneData, cfg: RenderConfig, cam: Camera,
                 lane_start, n_chunk: int, seed, **kw):
    """Public fused-render entry: _render_fused_core plus, for concrete
    full-frame calls, the peeled-primary host prepass (per-tile
    compacted tables shrink bounce 0 from s_pad/r_pad to K primitives).
    Traced callers (fused_diff custom_vjp, shard_map bodies) fall through
    to the plain core. All _render_fused_core kwargs pass through."""
    static = kw.get("static")
    try:
        eligible = (
            kw.get("ptab_full") is None and "p_k" not in kw
            and "pp_k" not in kw
            and static is not None
            and kw.get("s_pad_override") is None
            and kw.get("r_chunk_override") is None
            and not kw.get("s_chunk_override")
            and os.environ.get("RTW_S_CHUNK", "0") in ("", "0")
            and "notile" not in kw.get("ablate", "")
            and "nopeel" not in kw.get("ablate", "")
            and isinstance(n_chunk, int) and n_chunk == cfg.n_rays
            and not isinstance(lane_start, jax.core.Tracer)
            and int(lane_start) == 0
            and not isinstance(scene.spheres.c0, jax.core.Tracer)
            and not isinstance(cam.origin, jax.core.Tracer))
    except jax.errors.ConcretizationTypeError:
        eligible = False
    deep = (eligible and cfg.max_depth >= 16
            and not kw.get("emit_paths")
            and "nodeep" not in kw.get("ablate", "")
            and not kw.get("ablate"))
    if eligible:
        if deep:
            # Depth-phased render with stream compaction (deep configs
            # run at low slot occupancy in a single pass — see
            # render_fused_deep).
            return render_fused_deep(
                scene, cfg, cam, lane_start, n_chunk, seed, static,
                interpret=bool(kw.get("interpret", False)))
        dfr = (kw.get("defer_tex")
               if kw.get("defer_tex") is not None
               else bool(static.has_noise or static.has_image))
        peel = _peel_primary_tables(scene, static, cfg, cam, n_chunk,
                                    kw.get("tile_override"), dfr,
                                    bool(kw.get("emit_paths")))
        if peel:
            kw2 = {k: v for k, v in kw.items() if k not in peel}
            return _render_fused_core(scene, cfg, cam, lane_start, n_chunk,
                                      seed, **peel, **kw2)
    return _render_fused_core(scene, cfg, cam, lane_start, n_chunk, seed,
                              **kw)


def fused_supported(static: SceneStatic, cfg: RenderConfig) -> bool:
    """The fused megakernel handles this (scene, config)."""
    # Planar cap: tables are VMEM-resident; with the [hi; lo] split-gather
    # blocks they cost ~480 bytes/prim (pd 96 + po 128 + pg 2x128), so
    # ~18k prims ~ 8.6 MB + chunk planes (~1.8 MB) + ray state fits the
    # 16 MB scoped-VMEM limit; suspension (17,190 tris) verified on-chip.
    # Sphere cap: gather (64 rows) + K-split (144 rows) tables cost
    # 832 B/sphere and the (s_pad, L) intersection planes 512 B * ~6 live;
    # 2048 spheres ~ 1.7 MB tables + 6 MB planes. book2 (1006+pad) is the
    # largest catalog scene. (Caps kept at the round-3 verified envelope;
    # the dropped dead exact block leaves ~2.4 MB headroom at the planar
    # cap.)
    # Beyond the 18432-prim resident cap, planar tables stream from HBM
    # per chunk (p_stream, round 5) up to 128k prims — slower than the
    # resident path but far from the ~30x staged cliff.
    return (static.fused_simple
            and static.n_spheres <= 2048
            and static.n_rects + static.n_triangles <= (1 << 17)
            and static.n_volumes <= 8      # unrolled in-kernel
            and cfg.width > 1 and cfg.height > 1)
