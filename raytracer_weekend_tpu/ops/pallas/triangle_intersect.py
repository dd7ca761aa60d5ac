"""Pallas triangle-intersection kernel (Möller–Trumbore, VMEM-resident).

Same shape as sphere_intersect: one ray tile vs the whole triangle table per
grid step. Uses the scalar-triple factorization of ops/triangle.py — with
per-ray w = o x d, every pairwise term is a (TILE_B, 3) x (3, T) MXU matmul
against precomputed per-triangle rows {n, ab, ac, ac x v0, ab x v0, v0.n}
(triangular.rs:97-138 semantics), min-reduced in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_weekend_tpu.scene.data import Triangles
from raytracer_weekend_tpu.vecmath import cross, dot

_INF = jnp.inf


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_b(t_pad: int) -> int:
    """Ray-tile size (lane dim: multiple of 128) under ~8 MB of VMEM."""
    budget = 8 * 1024 * 1024 // (6 * 4 * t_pad)
    return int(max(128, min(1024, (budget // 128) * 128)))


def _kernel(o_ref, d_ref, n_ref, ab_ref, ac_ref, acxv0_ref, abxv0_ref,
            v0n_ref, valid_ref, tmin_ref, t_out, idx_out):
    oT = o_ref[:]                        # (3, TB)
    dT = d_ref[:]
    t_min = tmin_ref[0, 0]

    o = oT.T                             # (TB, 3)
    d = dT.T

    # Per-ray w = o x d.
    w0 = oT[1] * dT[2] - oT[2] * dT[1]
    w1 = oT[2] * dT[0] - oT[0] * dT[2]
    w2 = oT[0] * dT[1] - oT[1] * dT[0]
    w = jnp.stack([w0, w1, w2], axis=1)  # (TB, 3)

    det = -jnp.dot(d, n_ref[:], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    u_num = (jnp.dot(w, ac_ref[:], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
             - jnp.dot(d, acxv0_ref[:], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32))
    v_num = -(jnp.dot(w, ab_ref[:], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
              - jnp.dot(d, abxv0_ref[:], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32))
    t_num = jnp.dot(o, n_ref[:], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32) - v0n_ref[:]

    degenerate = det == 0.0
    inv_det = 1.0 / jnp.where(degenerate, 1.0, det)
    u = u_num * inv_det
    v = v_num * inv_det
    t = t_num * inv_det

    hit = ((t >= t_min) & (t >= 0.0)
           & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & ~degenerate & (valid_ref[:] > 0.0))
    t_all = jnp.where(hit, t, _INF)

    # Mosaic has no argmin lowering: iota-min over lanes at the row minimum.
    t_best = jnp.min(t_all, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 1)
    idx = jnp.min(jnp.where(t_all == t_best, cols, jnp.int32(0x7FFFFFFF)),
                  axis=1)
    t_out[:] = t_best.T
    idx_out[:] = idx[None, :]


def _pallas_forward(tr: Triangles, o: Array, d: Array,
                    t_min: float) -> tuple[Array, Array]:
    B = o.shape[0]
    T = tr.mat.shape[0]
    t_pad = _round_up(max(T, 128), 128)
    tile_b = _tile_b(t_pad)
    b_pad = _round_up(max(B, tile_b), tile_b)
    grid = (b_pad // tile_b,)

    ab = tr.v1 - tr.v0
    ac = tr.v2 - tr.v0
    n = cross(ab, ac)
    acxv0 = cross(ac, tr.v0)
    abxv0 = cross(ab, tr.v0)
    v0n = dot(tr.v0, n)

    def padT3(x):
        return jnp.pad(x, ((0, t_pad - T), (0, 0))).T     # (3, t_pad)

    def padT1(x, fill=0.0):
        return jnp.pad(x, (0, t_pad - T), constant_values=fill)[None, :]

    def padB(x):
        return jnp.pad(x, ((0, 0), (0, b_pad - B)))

    args = (padB(o.T), padB(d.T), padT3(n), padT3(ab), padT3(ac),
            padT3(acxv0), padT3(abxv0), padT1(v0n),
            padT1(tr.valid.astype(jnp.float32)),
            jnp.asarray([[t_min]], jnp.float32))

    ray_spec3 = pl.BlockSpec((3, tile_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    ray_spec1 = pl.BlockSpec((1, tile_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    table3 = pl.BlockSpec((3, t_pad), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    table1 = pl.BlockSpec((1, t_pad), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    t, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[ray_spec3, ray_spec3, table3, table3, table3, table3,
                  table3, table1, table1, smem_spec],
        out_specs=[ray_spec1, ray_spec1],
        out_shape=[
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=45 * b_pad * t_pad,
            bytes_accessed=(6 * b_pad + 20 * t_pad) * 4,
            transcendentals=0,
        ),
    )(*args)

    return t[0, :B], idx[0, :B]


def _winning_t(tr: Triangles, o, d, idx, t_min):
    """Differentiable recompute of the winning triangle's t (one gathered
    triangle per ray)."""
    v0 = tr.v0[idx]
    v1 = tr.v1[idx]
    v2 = tr.v2[idx]
    n = cross(v1 - v0, v2 - v0)
    det = -dot(d, n)
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    return dot(o - v0, n) * inv_det


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def hit_triangles_pallas(tr: Triangles, o: Array, d: Array,
                         t_min: float) -> tuple[Array, Array]:
    """Drop-in replacement for ops.triangle.hit_triangles on TPU."""
    return _pallas_forward(tr, o, d, t_min)


def _fwd(tr, o, d, t_min):
    t, idx = _pallas_forward(tr, o, d, t_min)
    return (t, idx), (tr, o, d, idx, t)


def _bwd(t_min, res, cot):
    tr, o, d, idx, t = res
    ct_t, _ = cot
    ct_t = jnp.where(jnp.isfinite(t), ct_t, 0.0)

    def f(tr, o, d):
        return _winning_t(tr, o, d, idx, t_min)

    _, vjp = jax.vjp(f, tr, o, d)
    g_tr, g_o, g_d = vjp(ct_t)
    return g_tr, g_o, g_d


hit_triangles_pallas.defvjp(_fwd, _bwd)
