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

    # Per-tile liveness skip: deferred-texture record batches are mostly
    # dead past bounce ~2 (code 0); an all-dead tile writes zeros and
    # skips the 7-octave loop entirely.
    flag = flags_ref[0, pl.program_id(0)]

    @pl.when(flag == 0)
    def _dead():
        out_ref[:, :] = jnp.zeros(out_ref.shape, f)

    @pl.when(flag > 0)
    def _live():
        _kernel_body(pts_ref, permf_ref, gradt_ref, out_ref, depth)


def _kernel_body(pts_ref, permf_ref, gradt_ref, out_ref, depth: int):
    f = jnp.float32
    iota6 = jax.lax.broadcasted_iota(jnp.int32, (_PC, 6 * _L), 0)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (_PC, 8 * _L), 0)

    dn = (((1,), (0,)), ((), ()))             # contract the 256 axis

    def lookup(row, oh):                      # (r, 256) x (256, n) -> (r, n)
        # DEFAULT (single bf16 pass): perm values are ints < 256 (exact in
        # bf16); gradient components ride the [hi; lo] split table below,
        # reconstructing f32 to ~2^-17. HIGHEST here cost 6 passes per
        # lookup and dropped two_perlin_spheres 16.3 -> 3.5M seg/s.
        return jax.lax.dot_general(row, oh, dn,
                                   preferred_element_type=f)

    for s in range(8):
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
            # ONE (3, 256) x (256, 6L) matmul for all six perm lookups
            # (M=1 lookups are MXU-issue-bound; lane-axis batching was the
            # round-5 lever that cut the per-point cost).
            idx6 = jnp.concatenate(
                [i0s[0], i1s[0], i0s[1], i1s[1], i0s[2], i1s[2]], axis=1)
            oh6 = jnp.where(iota6 == idx6, f(1.0), f(0.0))
            pres = lookup(permf_ref[0:3, :], oh6)         # (3, 6L)
            px0 = pres[0:1, 0 * _L:1 * _L].astype(jnp.int32)
            px1 = pres[0:1, 1 * _L:2 * _L].astype(jnp.int32)
            py0 = pres[1:2, 2 * _L:3 * _L].astype(jnp.int32)
            py1 = pres[1:2, 3 * _L:4 * _L].astype(jnp.int32)
            pz0 = pres[2:3, 4 * _L:5 * _L].astype(jnp.int32)
            pz1 = pres[2:3, 5 * _L:6 * _L].astype(jnp.int32)
            ux = fracs[0] * fracs[0] * (3.0 - 2.0 * fracs[0])  # Hermite
            uy = fracs[1] * fracs[1] * (3.0 - 2.0 * fracs[1])  # (ref quirk:
            uz = fracs[2] * fracs[2] * (3.0 - 2.0 * fracs[2])  # for weights)

            # ONE (8, 256) x (256, 8L) matmul for all eight corner
            # gradient lookups; corner order matches perlin._CORNERS
            # (i-major) so the f32 summation order equals the jnp path's
            # axis=-1 reduce.
            hs = []
            for i in range(2):
                for j in range(2):
                    for k3 in range(2):
                        hs.append(((px1 if i else px0)
                                   ^ (py1 if j else py0)
                                   ^ (pz1 if k3 else pz0)) & (_PC - 1))
            idx8 = jnp.concatenate(hs, axis=1)            # (1, 8L)
            oh8 = jnp.where(iota8 == idx8, f(1.0), f(0.0))
            g8 = lookup(gradt_ref[0:8, :], oh8)           # (8, 8L)
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
        flags = jnp.ones((1, T), jnp.int32)
    else:
        lv = jnp.pad(live.astype(jnp.int32), ((0, n_pad - N),))
        flags = lv.reshape(T, _TB).max(axis=1).reshape(1, T)
    # (N, 3) -> (24, T*L): coordinate-major rows of (8, L) tiles, matching
    # the kernel's point r = s*L + c layout.
    planes = (pts.reshape(T, 8, _L, 3).transpose(3, 1, 0, 2)
              .reshape(24, T * _L))
    permf = perms.astype(jnp.float32)                     # (3, 256)
    gt = gradients.astype(jnp.float32).T                  # (3, 256)
    # Bit-mask truncation, not a bf16 cast round-trip: XLA folds the cast
    # pair away on TPU (see megakernel._bf16_trunc).
    gh = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(gt, jnp.int32) & jnp.int32(-65536),
        jnp.float32)
    gradt = jnp.concatenate(
        [gh, gt - gh, jnp.zeros((2, _PC), jnp.float32)], axis=0)
    # (8, 256) [hi; lo; pad]: sublane-multiple rows for the VMEM block

    out = pl.pallas_call(
        functools.partial(_kernel, depth=depth),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((24, _L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _PC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _PC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _L), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, T * _L), jnp.float32),
        interpret=interpret,
    )(flags, planes, permf, gradt)

    return out.reshape(8, T, _L).transpose(1, 0, 2).reshape(n_pad)[:N]
