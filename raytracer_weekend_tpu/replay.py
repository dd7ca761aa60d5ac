"""Packed-row path replay: the fused megakernel's differentiable backward.

Re-traces paths recorded by the fused kernel (per-bounce winner codes,
ops.pallas.megakernel emit_paths) with the winner's O(S) search replaced by
O(1) lookups, so jax.vjp of this function is the kernel's VJP (fused_diff).

TPU-native layout: the first packed replay reused the staged path's
per-field table gathers (~30 gathers of (B,) per bounce) and its transpose
(~30 scatter-adds); measured on v5e that ran 20x slower than the fused
forward BEFORE the backward (tools/perf_r2g.py: replay fwd 207 ms vs fused
fwd 9.9 ms per 262k-lane chunk). This version gathers ONE pre-packed
per-primitive parameter row per lane per bounce (sphere (S, 20), planar
(R, 40) — built differentiably from the scene in O(S+R) once per chunk)
and shades from row columns (materials.scatter_packed), so the forward is
a single 2-D gather + elementwise math, and the backward transposes to a
single scatter-add per family per bounce followed by the packing's own
(cheap, dense) transpose.

Gradient semantics match the staged path exactly: discrete choices
(winners, hit/miss, reflect/refract) are fixed; continuous factors
(intersection t, normals, UVs, textures, scatter math) differentiate.
Formulas mirror ops/{sphere,rect,triangle}.py records (spherical.rs:38-77,
rectangular.rs:33-50, triangular.rs:97-138) so gradients agree numerically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from raytracer_weekend_tpu import materials as mat_mod
from raytracer_weekend_tpu import textures as tex_mod
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.ops.pallas.megakernel import _bf16_trunc
from raytracer_weekend_tpu.ops.sphere import sphere_uv
from raytracer_weekend_tpu.ops.volume import volume_candidates
from raytracer_weekend_tpu.scene.data import SceneData, SceneStatic
from raytracer_weekend_tpu.vecmath import cross, dot

_INF = jnp.float32(jnp.inf)

# Family ids inside the fused kernel's winner codes (fam + 4*idx):
_C_MISS, _C_SPHERE, _C_PLANAR, _C_VOLUME = 0, 1, 2, 3

# Row-gather tables at or under this row count get a custom backward: the
# forward is an exact XLA gather (on TPU ~10 cycles/index on the scalar
# unit — comparable to a one-hot matmul: 4.1 ms vs 4.0 ms per 1M rows, E4
# microbench BENCH_NOTES r3), but the autodiff TRANSPOSE of a gather is a
# scatter-add, 4x slower (9.5 ms vs 2.5 ms for the one-hot transpose).  So
# the custom VJP computes the table cotangent as a one-hot matmul on the
# MXU.  A DEFAULT-precision f32 dot on TPU is a single bf16 pass that
# rounds BOTH operands to 8-bit mantissas (the round-3 root cause; a plain
# one-hot forward here rounded sphere centers by ~2^-8 — e.g. 278 off by
# ~1 — invisibly to the CPU suite).  The one-hot itself is 0/1 and exact
# in bf16; the cotangent is split into three bf16-representable mantissa
# pieces (megakernel's integer-masking trick — a bf16 astype round-trip
# gets folded away on TPU) so every pass is exact and the summed result
# equals the scatter-add bitwise on exact backends.
_ONEHOT_MAX_ROWS = 4096


@jax.custom_vjp
def _rows_mxu(tab: Array, idx: Array) -> Array:
    return tab[idx]


def _rows_mxu_fwd(tab: Array, idx: Array):
    return tab[idx], (idx, tab.shape[0])


def _rows_mxu_bwd(res, g: Array):
    idx, S = res
    oh = (idx[:, None] == jnp.arange(S, dtype=idx.dtype)[None, :])
    oh = oh.astype(g.dtype)
    gh = _bf16_trunc(g)
    gm = _bf16_trunc(g - gh)
    gl = g - gh - gm
    # One K=3B matmul: [oh;oh;oh].T @ [gh;gm;gl] = oh.T@(gh+gm+gl); each
    # piece is bf16-exact, so the DEFAULT pass carries it exactly.
    oh3 = jnp.concatenate([oh, oh, oh], axis=0)
    g3 = jnp.concatenate([gh, gm, gl], axis=0)
    return oh3.T @ g3, None


_rows_mxu.defvjp(_rows_mxu_fwd, _rows_mxu_bwd)


def _rows(tab: Array, idx: Array) -> Array:
    """tab[(idx,)] with an MXU-transposed backward for small tables."""
    if tab.shape[0] > _ONEHOT_MAX_ROWS:
        return tab[idx]
    return _rows_mxu(tab, idx)


def _mat_cols(scene: SceneData, mat: Array):
    """Per-primitive material/texture parameter columns (each (N,) / (N,3));
    shared tail of every packed family table."""
    mt, tx = scene.materials, scene.textures
    tid = mt.tex[mat]
    return [
        mt.mtype[mat].astype(jnp.float32)[:, None],
        mt.fuzz[mat][:, None], mt.ior[mat][:, None],
        tx.ttype[tid].astype(jnp.float32)[:, None],
        tx.color1[tid], tx.color2[tid],
        tx.scale[tid][:, None],
        tx.image_id[tid].astype(jnp.float32)[:, None],
        tid.astype(jnp.float32)[:, None],
    ]  # 12 columns


# Column offsets of the shared material tail (s = family-specific width).
def _tail(row, s):
    return dict(
        mtype=jnp.round(row[:, s + 0]).astype(jnp.int32),
        fuzz=row[:, s + 1], ior=row[:, s + 2],
        ttype=jnp.round(row[:, s + 3]).astype(jnp.int32),
        c1=row[:, s + 4:s + 7], c2=row[:, s + 7:s + 10],
        scale=row[:, s + 10],
        img_id=jnp.round(row[:, s + 11]).astype(jnp.int32),
        tid=jnp.round(row[:, s + 12]).astype(jnp.int32),
    )


_SPH_TAIL = 8   # alpha(3) beta(3) r r2
_PLA_TAIL = 21  # n(3) k ua(3) ca ub(3) cb ns0(3) nsu(3) nsv(3) tu... see below


def _pack_spheres(scene: SceneData) -> Array:
    """(S, 8 + 13): alpha(3), beta(3), r, r2, material tail."""
    sp = scene.spheres
    dt = sp.t1 - sp.t0
    beta = (sp.c1 - sp.c0) / jnp.where(dt == 0, 1.0, dt)[:, None]
    alpha = sp.c0 - sp.t0[:, None] * beta
    cols = [alpha, beta, sp.radius[:, None], (sp.radius ** 2)[:, None],
            *_mat_cols(scene, sp.mat)]
    return jnp.concatenate(cols, axis=1)


def _pack_planar(scene: SceneData, static: SceneStatic) -> Array:
    """(R + T, 21 + 6 + 13) unified rect+triangle rows, rects first (the
    fused kernel's planar index order): geometry affine coefficients
    [n(3) k ua(3) ca ub(3) cb], shading interpolants [ns0 nsu nsv](9),
    texture affines [tu(3) tv(3)], material tail.

    Same coefficient definitions as ops.pallas.megakernel's planar tables:
    t = (k - n.o)/(n.d), u = ua.p + ca, v = ub.p + cb,
    outward = ns0 + u*nsu + v*nsv, tex_uv = (tu|tv) . (1, u, v).
    """
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
        z3 = jnp.zeros((Rn, 3), jnp.float32)
        one = jnp.ones((Rn,), jnp.float32)
        geom = [n, rc.k[:, None], ua, (-rc.a0 * inv_da)[:, None],
                ub, (-rc.b0 * inv_db)[:, None],
                n, z3, z3,                                    # ns0/nsu/nsv
                jnp.stack([z, one, z], 1), jnp.stack([z, z, one], 1)]
        parts.append(jnp.concatenate(geom + _mat_cols(scene, rc.mat), axis=1))
    if static.n_triangles:
        tr = scene.triangles
        ab = tr.v1 - tr.v0
        ac = tr.v2 - tr.v0
        n = cross(ab, ac)
        nsq = jnp.sum(n * n, axis=1)
        inv_nsq = (1.0 / jnp.where(nsq == 0, 1.0, nsq))[:, None]
        ua = cross(ac, n) * inv_nsq
        ub = cross(n, ab) * inv_nsq
        uv0 = tr.uv0
        geom = [n, jnp.sum(n * tr.v0, axis=1)[:, None],
                ua, -jnp.sum(ua * tr.v0, axis=1)[:, None],
                ub, -jnp.sum(ub * tr.v0, axis=1)[:, None],
                tr.n0, tr.n1 - tr.n0, tr.n2 - tr.n0,
                jnp.stack([uv0[:, 0], (tr.uv1 - uv0)[:, 0],
                           (tr.uv2 - uv0)[:, 0]], 1),
                jnp.stack([uv0[:, 1], (tr.uv1 - uv0)[:, 1],
                           (tr.uv2 - uv0)[:, 1]], 1)]
        parts.append(jnp.concatenate(geom + _mat_cols(scene, tr.mat), axis=1))
    return jnp.concatenate(parts, axis=0)


def _tex_value_packed(scene: SceneData, static: SceneStatic, tail,
                      u, v, p) -> Array:
    """texture_value from packed row columns: solid/checker/UVDebug are
    column math; noise/image (statically gated) use the shared texture code
    (textures.py — exact staged parity)."""
    ttype, c1, c2, scale = tail["ttype"], tail["c1"], tail["c2"], tail["scale"]
    out = c1
    sines = jnp.prod(jnp.sin(scale[:, None] * p), axis=-1)
    out = jnp.where(((ttype == tex_mod.CHECKER) & (sines < 0.0))[:, None],
                    c2, out)
    if static.has_noise:
        tx = scene.textures
        turb = tex_mod.perlin.turbulence(tx.perlin_grad, tx.perlin_perm, p,
                                         depth=7)
        marble = 0.5 * (1.0 + jnp.sin(scale * p[..., 2] + 10.0 * turb))
        out = jnp.where((ttype == tex_mod.NOISE)[:, None],
                        marble[:, None] * jnp.ones(3), out)
    if static.has_image:
        img = tex_mod._image_fetch(scene.textures, tail["img_id"], u, v,
                                   bilinear=False)
        out = jnp.where((ttype == tex_mod.IMAGE)[:, None], img, out)
    uvdbg = jnp.stack([u, v, jnp.zeros_like(u)], axis=-1)
    return jnp.where((ttype == tex_mod.UVDEBUG)[:, None], uvdbg, out)


def replay_rays(scene: SceneData, static: SceneStatic, cfg: RenderConfig,
                o: Array, d: Array, time: Array, ray_id: Array, seed,
                codes: Array) -> Array:
    """Differentiable radiance replay along saved winner paths -> (B,3).

    `codes` (B, max_depth) are the fused megakernel's per-bounce winner
    records (fam + 4*idx; 0 = miss or dead). jax.vjp of this function is
    the megakernel's backward pass (fused_diff.py).
    """
    B = o.shape[0]
    background = scene.background
    n_rects = static.n_rects

    sph_tab = _pack_spheres(scene) if static.n_spheres else None
    pla_tab = (_pack_planar(scene, static)
               if (static.n_rects or static.n_triangles) else None)
    if static.n_volumes:
        vmat = scene.volumes.mat
        vcol = scene.textures.color1[scene.materials.tex[vmat]]  # (V, 3)

    init = (
        o, d,
        jnp.ones((B, 3)),            # throughput
        jnp.zeros((B, 3)),           # radiance
        jnp.ones((B,), dtype=bool),  # alive
    )

    def bounce(state, xs):
        depth, code = xs
        o, d, throughput, radiance, alive = state
        code = code.astype(jnp.int32)
        hit_mask = alive & (code > 0)
        famc = code & 3
        idxg = code >> 2
        is_sph = hit_mask & (famc == _C_SPHERE)
        is_pla = hit_mask & (famc == _C_PLANAR)
        is_vol = hit_mask & (famc == _C_VOLUME)

        a = dot(d, d)
        t = jnp.zeros((B,))
        p = o
        outward = jnp.zeros((B, 3)).at[:, 0].set(1.0)
        u = jnp.zeros((B,))
        v = jnp.zeros((B,))
        mtype = jnp.zeros((B,), jnp.int32)
        fuzz = jnp.zeros((B,))
        ior = jnp.ones((B,))
        texc = jnp.ones((B, 3))

        if sph_tab is not None:
            row = _rows(sph_tab, jnp.where(is_sph, idxg, 0))  # (B, 21)
            alpha, beta = row[:, 0:3], row[:, 3:6]
            r, r2 = row[:, 6], row[:, 7]
            tail = _tail(row, _SPH_TAIL)
            center = alpha + time[:, None] * beta
            oc = o - center
            half_b = dot(oc, d)
            c_term = dot(oc, oc) - r2
            disc = half_b * half_b - a * c_term
            sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
            inv_a = 1.0 / a
            root1 = (-half_b - sq) * inv_a
            root2 = (-half_b + sq) * inv_a
            t_s = jnp.where(root1 >= cfg.t_min, root1, root2)
            p_s = o + t_s[:, None] * d
            out_s = (p_s - center) / r[:, None]
            u_s, v_s = sphere_uv(out_s)
            m = is_sph
            t = jnp.where(m, t_s, t)
            p = jnp.where(m[:, None], p_s, p)
            outward = jnp.where(m[:, None], out_s, outward)
            u = jnp.where(m, u_s, u)
            v = jnp.where(m, v_s, v)
            mtype = jnp.where(m, tail["mtype"], mtype)
            fuzz = jnp.where(m, tail["fuzz"], fuzz)
            ior = jnp.where(m, tail["ior"], ior)
            texc_s = _tex_value_packed(scene, static, tail, u_s, v_s, p_s)
            texc = jnp.where(m[:, None], texc_s, texc)

        if pla_tab is not None:
            row = _rows(pla_tab, jnp.where(is_pla, idxg, 0))  # (B, 40)
            n = row[:, 0:3]
            k = row[:, 3]
            ua, ca = row[:, 4:7], row[:, 7]
            ub, cb = row[:, 8:11], row[:, 11]
            ns0, nsu, nsv = row[:, 12:15], row[:, 15:18], row[:, 18:21]
            tu, tv = row[:, 21:24], row[:, 24:27]
            tail = _tail(row, _PLA_TAIL + 6)
            df = -dot(d, n)
            inv_df = 1.0 / jnp.where(df == 0.0, 1.0, df)
            t_p = (dot(o, n) - k) * inv_df
            p_p = o + t_p[:, None] * d
            u_b = dot(ua, p_p) + ca       # in-plane / barycentric coords
            v_b = dot(ub, p_p) + cb
            out_p = ns0 + u_b[:, None] * nsu + v_b[:, None] * nsv
            u_p = tu[:, 0] + u_b * tu[:, 1] + v_b * tu[:, 2]
            v_p = tv[:, 0] + u_b * tv[:, 1] + v_b * tv[:, 2]
            m = is_pla
            t = jnp.where(m, t_p, t)
            p = jnp.where(m[:, None], p_p, p)
            outward = jnp.where(m[:, None], out_p, outward)
            u = jnp.where(m, u_p, u)
            v = jnp.where(m, v_p, v)
            mtype = jnp.where(m, tail["mtype"], mtype)
            fuzz = jnp.where(m, tail["fuzz"], fuzz)
            ior = jnp.where(m, tail["ior"], ior)
            texc_p = _tex_value_packed(scene, static, tail, u_p, v_p, p_p)
            texc = jnp.where(m[:, None], texc_p, texc)

        if static.n_volumes:
            cand = volume_candidates(
                scene.volumes, o, d, cfg.t_min, seed, ray_id, depth,
                use_log10=cfg.use_log10_volume_sampling)     # (B, V)
            vidx = jnp.where(is_vol, idxg, 0)
            t_v = jnp.take_along_axis(cand, vidx[:, None], axis=-1)[..., 0]
            t_v = jnp.where(jnp.isfinite(t_v), t_v, 0.0)
            m = is_vol
            t = jnp.where(m, t_v, t)
            p = jnp.where(m[:, None], o + t_v[:, None] * d, p)
            # outward stays the (1,0,0) placeholder — isotropic ignores it.
            mtype = jnp.where(m, mat_mod.ISOTROPIC, mtype)
            texc = jnp.where(m[:, None], vcol[vidx], texc)

        # Shared bounce tail — identical semantics to integrator.trace_rays.
        miss = alive & ~hit_mask
        radiance = radiance + jnp.where(miss[:, None],
                                        throughput * background, 0.0)
        alive = hit_mask

        # Front-face flip (hittable/mod.rs:40-45); volumes fix
        # front_face=True (volumes.rs:66-68) — mirrors integrator._hit_record.
        front_face = (dot(d, outward) < 0.0) | is_vol
        normal = jnp.where(front_face[:, None], outward, -outward)

        sc = mat_mod.scatter_packed(mtype, fuzz, ior, texc, d, p, normal,
                                    front_face, seed, ray_id, depth)
        radiance = radiance + jnp.where(alive[:, None],
                                        throughput * sc.emitted, 0.0)
        throughput = jnp.where(alive[:, None],
                               throughput * sc.attenuation, throughput)
        alive = alive & sc.alive
        o = jnp.where(alive[:, None], p, o)
        d = jnp.where(alive[:, None], sc.direction, d)
        return (o, d, throughput, radiance, alive), None

    (_, _, _, radiance, _), _ = jax.lax.scan(
        bounce, init,
        (jnp.arange(cfg.max_depth, dtype=jnp.uint32), codes.T))
    return radiance
