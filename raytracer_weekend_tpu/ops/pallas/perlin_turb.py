"""Pallas Perlin-turbulence kernel: table lookups as one-hot MXU matmuls.

XLA's TPU gather executes at ~10 cycles per INDEX (scalar unit), and
perlin.turbulence needs 7 octaves x (6 perm + 8 gradient) lookups per
point — measured 2.03 s per 1M points on v5e (tools/perf_r3.E4), which made
the deferred-texture combine ~95% of the book2_final_scene frame
(BENCH_NOTES round 3). This kernel keeps the 256-entry tables VMEM-resident
and performs every lookup as a one-hot (256, L) compare + a (1|3, 256) x
(256, L) MXU matmul — no serial gathers, no HBM one-hot materialization.

Semantics match perlin.turbulence / perlin.noise exactly (same lattice
wrap, XOR hash, Hermite-before-weights reference quirk of perlin.rs:104-118,
same corner summation order); results differ from the jnp path only by f32
reassociation in the matmul-backed lookups (values are exact small ints, so
in practice they are bit-equal; the blend arithmetic is kept in the same
order as perlin.noise).

Forward-only: autodiff paths (replay/_tex_value_packed) keep the jnp
version, whose gathers XLA can differentiate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 1024           # points per tile
_L = _TB // 8        # lanes; points live as (8, L) planes per coordinate
_PC = 256            # Perlin table size


def _kernel(flags_ref, pts_ref, permf_ref, gradt_ref, out_ref, *,
            depth: int):
    f = jnp.float32

    # Liveness skip at ROW granularity (round 6; was per-tile): deferred-
    # texture record batches are mostly dead past bounce ~2 (code 0); a
    # dead 128-record row keeps its zero output and skips its 7-octave
    # loop. Eight straight-line pl.whens — the one-cond-per-body compile
    # constraint applies to loop bodies, not unrolled code.
    out_ref[:, :] = jnp.zeros(out_ref.shape, f)
    pid = pl.program_id(0)
    for s in range(8):
        @pl.when(flags_ref[pid, s] > 0)
        def _live(s=s):
            _kernel_row(pts_ref, permf_ref, gradt_ref, out_ref, depth, s)


def _kernel_row(pts_ref, permf_ref, gradt_ref, out_ref, depth: int,
                s: int):
    f = jnp.float32
    iota16_6 = jax.lax.broadcasted_iota(jnp.int32, (16, 6 * _L), 0)
    iota16_8 = jax.lax.broadcasted_iota(jnp.int32, (16, 8 * _L), 0)

    dn = (((1,), (0,)), ((), ()))             # contract the hi-nibble axis

    def lookup16(tab16, idx, iota16, nblk):
        # Two-level 16x16 table lookup (round 6): one-hot masks over the
        # hi/lo nibbles cost 16 rows each instead of 256 — the one-hot
        # MATERIALIZATION (~1 elem/cycle VPU) was the measured bound at
        # 21 ns/pt, not the matmul dispatch. tab16 is (16*R, 16) with
        # row 16r+l holding T_r[h*16+l]; M = tab16 @ hi_oh gives
        # M[16r+l, n] = T_r[16*hi_n + l], and the lo mask selects
        # T_r[16*hi_n + lo_n] — every step picks exact table entries
        # (one nonzero product per sum), so results are bit-identical
        # to the 256-wide one-hot path.
        hi = jax.lax.shift_right_logical(idx, 4)
        lo = idx & 15
        oh_hi = jnp.where(iota16 == hi, f(1.0), f(0.0))   # (16, nblk*L)
        oh_lo = jnp.where(iota16 == lo, f(1.0), f(0.0))
        M = jax.lax.dot_general(tab16, oh_hi, dn,
                                preferred_element_type=f)  # (16R, nblk*L)
        R = tab16.shape[0] // 16
        return [jnp.sum(oh_lo * M[16 * r:16 * r + 16, :], axis=0,
                        keepdims=True) for r in range(R)]

    if True:
        x = pts_ref[s:s + 1, :]
        y = pts_ref[8 + s:9 + s, :]
        z = pts_ref[16 + s:17 + s, :]
        accum = x * 0.0

        def octave(k, carry):
            accum, xs, ys, zs, w = carry
            fracs, i0s, i1s = [], [], []
            for c in (xs, ys, zs):
                pf = jnp.floor(c)
                fracs.append(c - pf)
                bi = pf.astype(jnp.int32)
                i0s.append(bi & (_PC - 1))
                i1s.append((bi + 1) & (_PC - 1))
            # ONE (48, 16) x (16, 6L) matmul for all six perm lookups.
            idx6 = jnp.concatenate(
                [i0s[0], i1s[0], i0s[1], i1s[1], i0s[2], i1s[2]], axis=1)
            pv = lookup16(permf_ref[0:48, :], idx6, iota16_6, 6)
            px0 = pv[0][0:1, 0 * _L:1 * _L].astype(jnp.int32)
            px1 = pv[0][0:1, 1 * _L:2 * _L].astype(jnp.int32)
            py0 = pv[1][0:1, 2 * _L:3 * _L].astype(jnp.int32)
            py1 = pv[1][0:1, 3 * _L:4 * _L].astype(jnp.int32)
            pz0 = pv[2][0:1, 4 * _L:5 * _L].astype(jnp.int32)
            pz1 = pv[2][0:1, 5 * _L:6 * _L].astype(jnp.int32)
            ux = fracs[0] * fracs[0] * (3.0 - 2.0 * fracs[0])  # Hermite
            uy = fracs[1] * fracs[1] * (3.0 - 2.0 * fracs[1])  # (ref quirk:
            uz = fracs[2] * fracs[2] * (3.0 - 2.0 * fracs[2])  # for weights)

            # ONE (96, 16) x (16, 8L) matmul for all eight corner
            # gradient lookups (6 used rows: [hi; lo] split components);
            # corner order matches perlin._CORNERS (i-major) so the f32
            # summation order equals the jnp path's axis=-1 reduce.
            hs = []
            for i in range(2):
                for j in range(2):
                    for k3 in range(2):
                        hs.append(((px1 if i else px0)
                                   ^ (py1 if j else py0)
                                   ^ (pz1 if k3 else pz0)) & (_PC - 1))
            idx8 = jnp.concatenate(hs, axis=1)            # (1, 8L)
            gv = lookup16(gradt_ref[0:96, :], idx8, iota16_8, 8)
            g8 = jnp.concatenate(gv, axis=0)              # (6, 8L)
            total = accum * 0.0
            ci = 0
            for i in range(2):
                for j in range(2):
                    for k3 in range(2):
                        g6 = g8[:, ci * _L:(ci + 1) * _L]
                        ci += 1
                        g = g6[0:3] + g6[3:6]   # hi + lo -> f32 gradient
                        wx = ux - f(i)
                        wy = uy - f(j)
                        wz = uz - f(k3)
                        blend = ((ux if i else 1.0 - ux)
                                 * (uy if j else 1.0 - uy)
                                 * (uz if k3 else 1.0 - uz))
                        dot = (g[0:1] * wx + g[1:2] * wy + g[2:3] * wz)
                        total = total + blend * dot
            # weight 0.5^k carried as a vector (scalar transcendentals are
            # shaky in Mosaic; halving is exact anyway).
            return (accum + w * total, xs * 2.0, ys * 2.0, zs * 2.0,
                    w * 0.5)

        accum, _, _, _, _ = jax.lax.fori_loop(
            0, depth, octave, (accum, x, y, z, x * 0.0 + 1.0))
        out_ref[s:s + 1, :] = jnp.abs(accum)


@functools.partial(jax.jit, static_argnames=("depth", "interpret"))
def turbulence_pallas(gradients: Array, perms: Array, p: Array,
                      depth: int = 7, interpret: bool = False,
                      live=None) -> Array:
    """|sum_k 0.5^k * noise(2^k p)| for p (N, 3) -> (N,).

    Drop-in for perlin.turbulence on flat batches (forward only).
    `live` (N,) bool optionally marks points whose value is consumed:
    all-dead tiles of _TB points are skipped in-kernel (their output is
    zeros — callers mask dead lanes anyway).
    """
    N = p.shape[0]
    n_pad = max(-(-N // _TB), 1) * _TB
    T = n_pad // _TB
    pts = jnp.pad(p.astype(jnp.float32), ((0, n_pad - N), (0, 0)))
    if live is None:
        flags = jnp.ones((T, 8), jnp.int32)
    else:
        lv = jnp.pad(live.astype(jnp.int32), ((0, n_pad - N),))
        flags = lv.reshape(T, 8, _L).max(axis=2)          # per-row flags
    # (N, 3) -> (24, T*L): coordinate-major rows of (8, L) tiles, matching
    # the kernel's point r = s*L + c layout.
    planes = (pts.reshape(T, 8, _L, 3).transpose(3, 1, 0, 2)
              .reshape(24, T * _L))
    # 16x16 two-level layout: row 16r+l of the (16R, 16) table holds
    # T_r[h*16+l] (see _kernel_row.lookup16).
    permf = (perms.astype(jnp.float32).reshape(3, 16, 16)
             .transpose(0, 2, 1).reshape(48, 16))
    gt = gradients.astype(jnp.float32).T                  # (3, 256)
    # Bit-mask truncation, not a bf16 cast round-trip: XLA folds the cast
    # pair away on TPU (see megakernel._bf16_trunc).
    gh = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(gt, jnp.int32) & jnp.int32(-65536),
        jnp.float32)
    gradt = (jnp.concatenate([gh, gt - gh], axis=0)       # (6, 256)
             .reshape(6, 16, 16).transpose(0, 2, 1).reshape(96, 16))

    out = pl.pallas_call(
        functools.partial(_kernel, depth=depth),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((24, _L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((96, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _L), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, T * _L), jnp.float32),
        interpret=interpret,
    )(flags, planes, permf, gradt)

    return out.reshape(8, T, _L).transpose(1, 0, 2).reshape(n_pad)[:N]


# --------------------------------------------------------------------------
# Hand-derived VJP kernel (round 5): d(turbulence)/d(p) and d/d(gradients).
#
# XLA's autodiff of the jnp turbulence costs ~2 s per 1M records on v5e
# (serial gathers + scatter-add transpose), which made noise-scene
# fwd+bwd 25.8 s/frame. This kernel recomputes the forward (pass 1: the
# octave accumulation for the |.| sign) and then walks the octaves again
# applying the chain rules (pass 2):
#   noise = sum_c blend_c(u) * dot(g_c, u - corner_c)   [ref Hermite quirk]
#   d/du_x  = sum_c (+-1)(b_y b_z) dot_c + blend_c g_c.x
#   du/dfrac = 6 f (1-f);  dq/dp = 2^k
#   d/dg_c  = blend_c * (u - corner_c)  -> transposed one-hot matmul into
#             the (8, 256) table-cotangent block (revisited across tiles;
#             DEFAULT precision — per-term bf16 rounding is unbiased and
#             averages out over thousands of lanes; the perlin_grad leaf
#             is gated on aggregate L2 + direction).
# --------------------------------------------------------------------------


def _vjp_kernel(flags_ref, pts_ref, ct_ref, permf_ref, gradt_ref,
                dp_ref, dtab_ref, *, depth: int):
    f = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dtab_ref[:, :] = jnp.zeros(dtab_ref.shape, f)

    # flags is (T, 8) per-ROW liveness since the forward went
    # row-granular; this kernel gates at tile level, so OR the tile's
    # rows. (Regression: reading flags_ref[0, pid] — the old (1, T)
    # layout — made every tile past the first read tile-0's row flags,
    # silently zeroing most live tiles' cotangents on real masks; the
    # all-ones live=None path, which the unit tests used, was blind.)
    pid = pl.program_id(0)
    flag = flags_ref[pid, 0]
    for s in range(1, 8):
        flag = jnp.maximum(flag, flags_ref[pid, s])

    @pl.when(flag == 0)
    def _dead():
        dp_ref[:, :] = jnp.zeros(dp_ref.shape, f)

    @pl.when(flag > 0)
    def _live():
        _vjp_body(pts_ref, ct_ref, permf_ref, gradt_ref, dp_ref,
                  dtab_ref, depth)


def _vjp_body(pts_ref, ct_ref, permf_ref, gradt_ref, dp_ref, dtab_ref,
              depth: int):
    f = jnp.float32
    iota6 = jax.lax.broadcasted_iota(jnp.int32, (_PC, 6 * _L), 0)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (_PC, 8 * _L), 0)
    dn = (((1,), (0,)), ((), ()))
    dnt = (((1,), (1,)), ((), ()))            # contract the lane axis

    def lookup(row, oh):
        return jax.lax.dot_general(row, oh, dn, preferred_element_type=f)

    for s in range(8):
        x = pts_ref[s:s + 1, :]
        y = pts_ref[8 + s:9 + s, :]
        z = pts_ref[16 + s:17 + s, :]
        ct = ct_ref[s:s + 1, :]

        def octave_terms(xs, ys, zs):
            """Shared per-octave recompute: Hermite coords, corner one-hot
            bank, corner gradients and dots."""
            fracs, i0s, i1s = [], [], []
            for c in (xs, ys, zs):
                pf = jnp.floor(c)
                fracs.append(c - pf)
                bi = pf.astype(jnp.int32)
                i0s.append(bi & (_PC - 1))
                i1s.append((bi + 1) & (_PC - 1))
            idx6 = jnp.concatenate(
                [i0s[0], i1s[0], i0s[1], i1s[1], i0s[2], i1s[2]], axis=1)
            oh6 = jnp.where(iota6 == idx6, f(1.0), f(0.0))
            pres = lookup(permf_ref[0:3, :], oh6)
            px0 = pres[0:1, 0 * _L:1 * _L].astype(jnp.int32)
            px1 = pres[0:1, 1 * _L:2 * _L].astype(jnp.int32)
            py0 = pres[1:2, 2 * _L:3 * _L].astype(jnp.int32)
            py1 = pres[1:2, 3 * _L:4 * _L].astype(jnp.int32)
            pz0 = pres[2:3, 4 * _L:5 * _L].astype(jnp.int32)
            pz1 = pres[2:3, 5 * _L:6 * _L].astype(jnp.int32)
            hs = []
            for i in range(2):
                for j in range(2):
                    for k3 in range(2):
                        hs.append(((px1 if i else px0)
                                   ^ (py1 if j else py0)
                                   ^ (pz1 if k3 else pz0)) & (_PC - 1))
            idx8 = jnp.concatenate(hs, axis=1)
            oh8 = jnp.where(iota8 == idx8, f(1.0), f(0.0))
            g8 = lookup(gradt_ref[0:8, :], oh8)
            us = [fr * fr * (3.0 - 2.0 * fr) for fr in fracs]
            return fracs, us, oh8, g8

        # ---- pass 1: forward accumulation for the |accum| sign ----------
        def fwd_oct(k, carry):
            accum, xs, ys, zs, w = carry
            _, us, _, g8 = octave_terms(xs, ys, zs)
            ux, uy, uz = us
            total = accum * 0.0
            ci = 0
            for i in range(2):
                for j in range(2):
                    for k3 in range(2):
                        g6 = g8[:, ci * _L:(ci + 1) * _L]
                        ci += 1
                        g = g6[0:3] + g6[3:6]
                        blend = ((ux if i else 1.0 - ux)
                                 * (uy if j else 1.0 - uy)
                                 * (uz if k3 else 1.0 - uz))
                        dot = (g[0:1] * (ux - f(i)) + g[1:2] * (uy - f(j))
                               + g[2:3] * (uz - f(k3)))
                        total = total + blend * dot
            return (accum + w * total, xs * 2.0, ys * 2.0, zs * 2.0,
                    w * 0.5)

        accum, _, _, _, _ = jax.lax.fori_loop(
            0, depth, fwd_oct, (x * 0.0, x, y, z, x * 0.0 + 1.0))
        sgn = jnp.where(accum > 0.0, f(1.0), jnp.where(accum < 0.0,
                                                       f(-1.0), f(0.0)))
        g_out = sgn * ct                       # d(accum)

        # ---- pass 2: chain rules per octave -----------------------------
        def bwd_oct(k, carry):
            dpx, dpy, dpz, xs, ys, zs, w, sc = carry
            fracs, us, oh8, g8 = octave_terms(xs, ys, zs)
            fx, fy, fz = fracs
            ux, uy, uz = us
            dn_ux = x * 0.0
            dn_uy = x * 0.0
            dn_uz = x * 0.0
            ci = 0
            for i in range(2):
                for j in range(2):
                    for k3 in range(2):
                        oh = oh8[:, ci * _L:(ci + 1) * _L]
                        g6 = g8[:, ci * _L:(ci + 1) * _L]
                        ci += 1
                        g = g6[0:3] + g6[3:6]
                        bx = ux if i else 1.0 - ux
                        by = uy if j else 1.0 - uy
                        bz = uz if k3 else 1.0 - uz
                        blend = bx * by * bz
                        wx = ux - f(i)
                        wy = uy - f(j)
                        wz = uz - f(k3)
                        dot = g[0:1] * wx + g[1:2] * wy + g[2:3] * wz
                        sx = f(1.0) if i else f(-1.0)
                        sy = f(1.0) if j else f(-1.0)
                        sz = f(1.0) if k3 else f(-1.0)
                        dn_ux = dn_ux + sx * by * bz * dot + blend * g[0:1]
                        dn_uy = dn_uy + sy * bx * bz * dot + blend * g[1:2]
                        dn_uz = dn_uz + sz * bx * by * dot + blend * g[2:3]
                        # table cotangent: d/dg_c = w*g_out*blend*(wx,wy,wz)
                        cb = w * g_out * blend
                        cot = jnp.concatenate(
                            [cb * wx, cb * wy, cb * wz,
                             x * 0.0, x * 0.0, x * 0.0, x * 0.0, x * 0.0],
                            axis=0)            # (8, L), 3 live rows
                        dtab_ref[:, :] = dtab_ref[:, :] + \
                            jax.lax.dot_general(cot, oh, dnt,
                                                preferred_element_type=f)
            go = w * g_out
            dpx = dpx + go * dn_ux * 6.0 * fx * (1.0 - fx) * sc
            dpy = dpy + go * dn_uy * 6.0 * fy * (1.0 - fy) * sc
            dpz = dpz + go * dn_uz * 6.0 * fz * (1.0 - fz) * sc
            return (dpx, dpy, dpz, xs * 2.0, ys * 2.0, zs * 2.0,
                    w * 0.5, sc * 2.0)

        z0 = x * 0.0
        dpx, dpy, dpz, _, _, _, _, _ = jax.lax.fori_loop(
            0, depth, bwd_oct,
            (z0, z0, z0, x, y, z, z0 + 1.0, z0 + 1.0))
        dp_ref[s:s + 1, :] = dpx
        dp_ref[8 + s:9 + s, :] = dpy
        dp_ref[16 + s:17 + s, :] = dpz


@functools.partial(jax.jit, static_argnames=("depth", "interpret"))
def turbulence_vjp_pallas(gradients: Array, perms: Array, p: Array,
                          ct: Array, depth: int = 7,
                          interpret: bool = False, live=None):
    """VJP of turbulence_pallas: (d_gradients (256, 3), d_p (N, 3))."""
    N = p.shape[0]
    n_pad = max(-(-N // _TB), 1) * _TB
    T = n_pad // _TB
    pts = jnp.pad(p.astype(jnp.float32), ((0, n_pad - N), (0, 0)))
    ctp = jnp.pad(ct.astype(jnp.float32), ((0, n_pad - N),))
    if live is None:
        flags = jnp.ones((T, 8), jnp.int32)
    else:
        lv = jnp.pad(live.astype(jnp.int32), ((0, n_pad - N),))
        flags = lv.reshape(T, 8, _L).max(axis=2)          # per-row flags
    planes = (pts.reshape(T, 8, _L, 3).transpose(3, 1, 0, 2)
              .reshape(24, T * _L))
    ct_planes = ctp.reshape(T, 8, _L).transpose(1, 0, 2).reshape(8, T * _L)
    permf = perms.astype(jnp.float32)
    gt = gradients.astype(jnp.float32).T
    gh = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(gt, jnp.int32) & jnp.int32(-65536),
        jnp.float32)
    gradt = jnp.concatenate(
        [gh, gt - gh, jnp.zeros((2, _PC), jnp.float32)], axis=0)

    dp, dtab = pl.pallas_call(
        functools.partial(_vjp_kernel, depth=depth),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((24, _L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _PC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _PC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((24, _L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _PC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((24, T * _L), jnp.float32),
            jax.ShapeDtypeStruct((8, _PC), jnp.float32),
        ],
        interpret=interpret,
    )(flags, planes, ct_planes, permf, gradt)

    d_p = (dp.reshape(3, 8, T, _L).transpose(2, 1, 3, 0)
           .reshape(n_pad, 3)[:N])
    d_grad = dtab[0:3, :].T                    # (256, 3)
    return d_grad.astype(gradients.dtype), d_p


@functools.lru_cache(maxsize=8)
def _make_turb_diff(depth: int, interpret: bool):
    import numpy as np

    def _f0(x):
        return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)

    @jax.custom_vjp
    def turb(gradients, perms, p, live):
        return turbulence_pallas(gradients, perms, p, depth,
                                 interpret=interpret, live=live)

    def fwd(gradients, perms, p, live):
        return turb(gradients, perms, p, live), (gradients, perms, p, live)

    def bwd(res, ct):
        gradients, perms, p, live = res
        d_grad, d_p = turbulence_vjp_pallas(gradients, perms, p, ct,
                                            depth, interpret=interpret,
                                            live=live)
        live_ct = None if live is None else _f0(live)
        return (d_grad, _f0(perms), d_p, live_ct)

    turb.defvjp(fwd, bwd)
    return turb


def turbulence_pallas_diff(gradients: Array, perms: Array, p: Array,
                           depth: int = 7, interpret: bool = False,
                           live=None) -> Array:
    """Differentiable turbulence_pallas: the forward kernel with the
    hand-derived VJP kernel as its backward (gradients flow to the
    gradient table and to p; the permutation tables are integers)."""
    return _make_turb_diff(int(depth), bool(interpret))(
        gradients, perms, p, live)
