"""Pallas rect-intersection kernel (one-hot axis selection, VMEM-resident).

Same tiling as the sphere/triangle kernels. Per-rect one-hot axis selectors
turn the per-(ray, rect) coordinate picks of rectangular.rs:27-167 into six
(TILE_B, 3) x (3, R) MXU matmuls; bounds tests and the min-reduce stay in
VMEM. Matters for the book2 final scene, whose 400 ground cuboids are 2400
axis-aligned rects (scenes.rs:489-509).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_weekend_tpu.scene.data import Rects

_INF = jnp.inf


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_b(r_pad: int) -> int:
    budget = 8 * 1024 * 1024 // (6 * 4 * r_pad)
    return int(max(128, min(1024, (budget // 128) * 128)))


def _kernel(o_ref, d_ref, f_ref, a_ref, b_ref, k_ref, a0_ref, a1_ref,
            b0_ref, b1_ref, valid_ref, tmin_ref, t_out, idx_out):
    o = o_ref[:].T                       # (TB, 3)
    d = d_ref[:].T
    t_min = tmin_ref[0, 0]

    o_f = jnp.dot(o, f_ref[:], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (TB,R)
    d_f = jnp.dot(d, f_ref[:], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    o_a = jnp.dot(o, a_ref[:], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    d_a = jnp.dot(d, a_ref[:], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    o_b = jnp.dot(o, b_ref[:], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    d_b = jnp.dot(d, b_ref[:], precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    t = (k_ref[:] - o_f) / d_f
    av = o_a + t * d_a
    bv = o_b + t * d_b

    hit = ((t >= t_min)
           & (av >= a0_ref[:]) & (av <= a1_ref[:])
           & (bv >= b0_ref[:]) & (bv <= b1_ref[:])
           & (valid_ref[:] > 0.0))
    t_all = jnp.where(hit, t, _INF)

    t_best = jnp.min(t_all, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 1)
    idx = jnp.min(jnp.where(t_all == t_best, cols, jnp.int32(0x7FFFFFFF)),
                  axis=1)
    t_out[:] = t_best.T
    idx_out[:] = idx[None, :]


def _pallas_forward(rc: Rects, o: Array, d: Array,
                    t_min: float) -> tuple[Array, Array]:
    B = o.shape[0]
    R = rc.k.shape[0]
    r_pad = _round_up(max(R, 128), 128)
    tile_b = _tile_b(r_pad)
    b_pad = _round_up(max(B, tile_b), tile_b)
    grid = (b_pad // tile_b,)

    a_axis = jnp.where(rc.axis == 0, 1, 0)
    b_axis = jnp.where(rc.axis == 2, 1, 2)

    def onehot_pad(ax):
        oh = jax.nn.one_hot(ax, 3, dtype=jnp.float32)       # (R, 3)
        return jnp.pad(oh, ((0, r_pad - R), (0, 0))).T       # (3, r_pad)

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, r_pad - R), constant_values=fill)[None, :]

    def padB(x):
        return jnp.pad(x, ((0, 0), (0, b_pad - B)))

    args = (padB(o.T), padB(d.T), onehot_pad(rc.axis), onehot_pad(a_axis),
            onehot_pad(b_axis), pad1(rc.k), pad1(rc.a0), pad1(rc.a1),
            pad1(rc.b0), pad1(rc.b1), pad1(rc.valid.astype(jnp.float32)),
            jnp.asarray([[t_min]], jnp.float32))

    ray3 = pl.BlockSpec((3, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    ray1 = pl.BlockSpec((1, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    tab3 = pl.BlockSpec((3, r_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    tab1 = pl.BlockSpec((1, r_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    t, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[ray3, ray3, tab3, tab3, tab3, tab1, tab1, tab1, tab1,
                  tab1, tab1, smem],
        out_specs=[ray1, ray1],
        out_shape=[
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * b_pad * r_pad,
            bytes_accessed=(6 * b_pad + 15 * r_pad) * 4,
            transcendentals=0,
        ),
    )(*args)
    return t[0, :B], idx[0, :B]


def _winning_t(rc: Rects, o, d, idx):
    axis = rc.axis[idx]
    o_f = jnp.take_along_axis(o, axis[:, None], axis=-1)[..., 0]
    d_f = jnp.take_along_axis(d, axis[:, None], axis=-1)[..., 0]
    return (rc.k[idx] - o_f) / jnp.where(d_f == 0.0, 1.0, d_f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def hit_rects_pallas(rc: Rects, o: Array, d: Array,
                     t_min: float) -> tuple[Array, Array]:
    """Drop-in replacement for ops.rect.hit_rects on TPU."""
    return _pallas_forward(rc, o, d, t_min)


def _fwd(rc, o, d, t_min):
    t, idx = _pallas_forward(rc, o, d, t_min)
    return (t, idx), (rc, o, d, idx, t)


def _bwd(t_min, res, cot):
    rc, o, d, idx, t = res
    ct_t, _ = cot
    ct_t = jnp.where(jnp.isfinite(t), ct_t, 0.0)

    def f(rc, o, d):
        return _winning_t(rc, o, d, idx)

    _, vjp = jax.vjp(f, rc, o, d)
    g_rc, g_o, g_d = vjp(ct_t)
    return g_rc, g_o, g_d


hit_rects_pallas.defvjp(_fwd, _bwd)
