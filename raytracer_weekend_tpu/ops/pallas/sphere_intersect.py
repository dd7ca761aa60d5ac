"""Pallas sphere-intersection kernel: VMEM-resident brute force.

Per grid step, one tile of TILE_B rays meets the full sphere table:
  * the (TILE_B, 3) x (3, S) pairwise dot products run on the MXU,
  * the quadratic solve + root selection (spherical.rs:18-60 semantics,
    including center_at_time motion lerp spherical.rs:117-123) runs on the
    VPU entirely in VMEM,
  * min/argmin over spheres happens before anything is written back,
so HBM sees only the (B,) outputs instead of O(B*S) intermediates — the
difference between the HBM-bound jnp path and a compute-bound kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_weekend_tpu.scene.data import Spheres

_INF = jnp.inf


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_b(s_pad: int) -> int:
    """Ray-tile size (lane dim: multiple of 128) keeping ~6 live
    (TILE_B, S) f32 arrays under ~8 MB of VMEM."""
    budget = 8 * 1024 * 1024 // (6 * 4 * s_pad)
    return int(max(128, min(1024, (budget // 128) * 128)))


def _kernel(o_ref, d_ref, time_ref, c0_ref, dc_ref, t0_ref, inv_dt_ref,
            r2_ref, valid_ref, tmin_ref, t_out, idx_out):
    oT = o_ref[:]                       # (3, TB)
    dT = d_ref[:]
    time = time_ref[:]                  # (1, TB)
    t_min = tmin_ref[0, 0]

    o = oT.T                            # (TB, 3)
    d = dT.T

    c0 = c0_ref[:]                      # (3, S)
    dc = dc_ref[:]

    # MXU pairwise dots.
    o_c0 = jnp.dot(o, c0, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)   # (TB, S)
    o_dc = jnp.dot(o, dc, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    d_c0 = jnp.dot(d, c0, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    d_dc = jnp.dot(d, dc, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    # Per-ray scalars (VPU).
    a = jnp.sum(dT * dT, axis=0)[:, None]        # (TB, 1)
    o_dot_d = jnp.sum(oT * dT, axis=0)[:, None]
    o_sq = jnp.sum(oT * oT, axis=0)[:, None]

    # Per-sphere scalars.
    c0_sq = jnp.sum(c0 * c0, axis=0)[None, :]     # (1, S)
    c0_dc = jnp.sum(c0 * dc, axis=0)[None, :]
    dc_sq = jnp.sum(dc * dc, axis=0)[None, :]

    w = (time.T - t0_ref[:]) * inv_dt_ref[:]      # (TB, S)

    d_dot_c = d_c0 + w * d_dc
    o_dot_c = o_c0 + w * o_dc
    c_sq = c0_sq + 2.0 * w * c0_dc + w * w * dc_sq

    half_b = o_dot_d - d_dot_c
    c_term = o_sq - 2.0 * o_dot_c + c_sq - r2_ref[:]

    disc = half_b * half_b - a * c_term
    has_roots = disc > 0.0
    sqrtd = jnp.sqrt(jnp.where(has_roots, disc, 1.0))
    inv_a = 1.0 / a
    root1 = (-half_b - sqrtd) * inv_a
    root2 = (-half_b + sqrtd) * inv_a
    r1_ok = root1 >= t_min
    root = jnp.where(r1_ok, root1, root2)
    hit = has_roots & (root >= t_min) & (valid_ref[:] > 0.0)
    t_all = jnp.where(hit, root, _INF)

    # Mosaic has no argmin lowering: recover the first-minimum index via an
    # iota-min over lanes equal to the rowwise minimum.
    t_best = jnp.min(t_all, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 1)
    idx = jnp.min(jnp.where(t_all == t_best, cols, jnp.int32(0x7FFFFFFF)),
                  axis=1)
    t_out[:] = t_best.T
    idx_out[:] = idx[None, :]


def _pallas_forward(sp: Spheres, o: Array, d: Array, time: Array,
                    t_min: float) -> tuple[Array, Array]:
    B = o.shape[0]
    S = sp.radius.shape[0]
    s_pad = _round_up(max(S, 128), 128)
    tile_b = _tile_b(s_pad)
    b_pad = _round_up(max(B, tile_b), tile_b)
    grid = (b_pad // tile_b,)

    def padS(x, fill=0.0):
        return jnp.pad(x, (0, s_pad - S), constant_values=fill)

    c0 = jnp.pad(sp.c0, ((0, s_pad - S), (0, 0))).T          # (3, S)
    dc = jnp.pad(sp.c1 - sp.c0, ((0, s_pad - S), (0, 0))).T
    t0 = padS(sp.t0)[None, :]
    inv_dt = padS(1.0 / (sp.t1 - sp.t0), fill=1.0)[None, :]
    r2 = padS(sp.radius * sp.radius)[None, :]
    valid = padS(sp.valid.astype(jnp.float32))[None, :]

    def padB(x):
        return jnp.pad(x, ((0, 0), (0, b_pad - B)))

    oT = padB(o.T)           # (3, b_pad)
    dT = padB(d.T)
    timeR = padB(time[None, :])
    tmin_arr = jnp.asarray([[t_min]], jnp.float32)

    ray_spec3 = pl.BlockSpec((3, tile_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    ray_spec1 = pl.BlockSpec((1, tile_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((1, s_pad), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    table_spec3 = pl.BlockSpec((3, s_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    t, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[ray_spec3, ray_spec3, ray_spec1, table_spec3, table_spec3,
                  table_spec, table_spec, table_spec, table_spec, smem_spec],
        out_specs=[ray_spec1, ray_spec1],
        out_shape=[
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * b_pad * s_pad,
            bytes_accessed=(6 * b_pad + 10 * s_pad) * 4,
            transcendentals=b_pad * s_pad,
        ),
    )(oT, dT, timeR, c0, dc, t0, inv_dt, r2, valid, tmin_arr)

    return t[0, :B], idx[0, :B]


def _winning_root(sp: Spheres, o, d, time, idx, t_min):
    """Differentiable recompute of the winning sphere's accepted root
    (one gathered sphere per ray; same selection as the kernel)."""
    c0 = sp.c0[idx]
    c1 = sp.c1[idx]
    w = ((time - sp.t0[idx]) / (sp.t1[idx] - sp.t0[idx]))[:, None]
    c = c0 + w * (c1 - c0)
    r = sp.radius[idx]
    oc = o - c
    a = jnp.sum(d * d, -1)
    half_b = jnp.sum(oc * d, -1)
    c_term = jnp.sum(oc * oc, -1) - r * r
    disc = half_b * half_b - a * c_term
    ok = disc > 0.0
    sqrtd = jnp.sqrt(jnp.where(ok, disc, 1.0))
    inv_a = 1.0 / a
    root1 = (-half_b - sqrtd) * inv_a
    root2 = (-half_b + sqrtd) * inv_a
    return jnp.where(root1 >= t_min, root1, root2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def hit_spheres_pallas(sp: Spheres, o: Array, d: Array, time: Array,
                       t_min: float) -> tuple[Array, Array]:
    """Drop-in replacement for ops.sphere.hit_spheres on TPU."""
    return _pallas_forward(sp, o, d, time, t_min)


def _fwd(sp, o, d, time, t_min):
    t, idx = _pallas_forward(sp, o, d, time, t_min)
    return (t, idx), (sp, o, d, time, idx, t)


def _bwd(t_min, res, cot):
    sp, o, d, time, idx, t = res
    ct_t, _ = cot
    ct_t = jnp.where(jnp.isfinite(t), ct_t, 0.0)  # misses carry no gradient

    def f(sp, o, d, time):
        return _winning_root(sp, o, d, time, idx, t_min)

    _, vjp = jax.vjp(f, sp, o, d, time)
    g_sp, g_o, g_d, g_time = vjp(ct_t)
    return g_sp, g_o, g_d, g_time


hit_spheres_pallas.defvjp(_fwd, _bwd)
