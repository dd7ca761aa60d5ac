"""Constant-density medium interaction (probabilistic "hit").

Rebuild of ConstantMedium::hit (volumes.rs:38-78). The reference finds the
boundary entry/exit by two nested `hit` calls with t ranges (-inf, inf) and
(t1+1e-4, inf); for the convex boundaries actually used by the scenes
(spheres, cuboids — optionally Y-rotated + translated) those are exactly the
two quadratic roots / the slab-test [enter, exit] interval, computed here in
closed form for B rays x V volumes at once.

Scatter distance is sampled per (ray, volume) from a counter-based uniform:
    hit_distance = -1/density * log10(U)        (volumes.rs:58)
The reference uses log10 where the physically standard exponential sampler
uses ln — kept behind `use_log10` (default True) for parity.

Order-independence note: the reference clamps the exit t by the linear
search's `closest_so_far`, making its per-call behavior list-order dependent;
the *final* closest hit is not (a scatter sampled beyond a nearer surface
loses the global min anyway), so this kernel just emits candidate distances
and lets the integrator's min decide.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from raytracer_weekend_tpu import rng as rt_rng
from raytracer_weekend_tpu.scene.data import VOL_BOX, VOL_SPHERE, Volumes
from raytracer_weekend_tpu.vecmath import dot, ray_at

_INF = jnp.inf
_LN10_INV = 0.43429448190325176  # log10(x) = ln(x) * 1/ln(10)


def _object_space_rays(vol: Volumes, o: Array, d: Array):
    """Move rays into each volume's object frame (transformations.rs:116-127).

    Returns (B,V,3) origin/direction. V is tiny (<=4 in every reference
    scene), so the pairwise expansion is cheap.
    """
    ot = o[:, None, :] - vol.offset[None, :, :]          # translate in
    c = vol.cos_t[None, :]
    s = vol.sin_t[None, :]
    ox = c * ot[..., 0] - s * ot[..., 2]
    oz = s * ot[..., 0] + c * ot[..., 2]
    dx = c * d[:, None, 0] - s * d[:, None, 2]
    dz = s * d[:, None, 0] + c * d[:, None, 2]
    o_obj = jnp.stack([ox, ot[..., 1], oz], axis=-1)
    d_obj = jnp.stack([dx, jnp.broadcast_to(d[:, None, 1], dx.shape), dz], axis=-1)
    return o_obj, d_obj


def _boundary_interval(vol: Volumes, o_obj: Array, d_obj: Array):
    """[enter, exit] of each ray with each boundary; (B,V) each + bool mask."""
    # Sphere boundary: quadratic roots (spherical.rs:26-45 with t range -inf..inf).
    oc = o_obj - vol.center[None, :, :]
    a = jnp.sum(d_obj * d_obj, axis=-1)
    half_b = jnp.sum(oc * d_obj, axis=-1)
    c_term = jnp.sum(oc * oc, axis=-1) - (vol.radius**2)[None, :]
    disc = half_b * half_b - a * c_term
    sph_ok = disc > 0.0
    sqrtd = jnp.sqrt(jnp.where(sph_ok, disc, 1.0))
    inv_a = 1.0 / a
    sph_enter = (-half_b - sqrtd) * inv_a
    sph_exit = (-half_b + sqrtd) * inv_a

    # Box boundary: slab test (aabb.rs:23-48 semantics; enter<exit strict).
    inv_d = 1.0 / d_obj
    t0 = (vol.bmin[None, :, :] - o_obj) * inv_d
    t1 = (vol.bmax[None, :, :] - o_obj) * inv_d
    t_near = jnp.minimum(t0, t1)
    t_far = jnp.maximum(t0, t1)
    box_enter = jnp.max(t_near, axis=-1)
    box_exit = jnp.min(t_far, axis=-1)
    box_ok = box_enter < box_exit

    is_box = (vol.vtype == VOL_BOX)[None, :]
    enter = jnp.where(is_box, box_enter, sph_enter)
    exit_ = jnp.where(is_box, box_exit, sph_exit)
    ok = jnp.where(is_box, box_ok, sph_ok)
    return enter, exit_, ok


def volume_candidates(vol: Volumes, o: Array, d: Array, t_min: float,
                      seed, ray_id: Array, depth,
                      *, use_log10: bool = True) -> Array:
    """Per-(ray, volume) scatter-distance candidates -> (B, V) t, +inf none.

    The full candidate plane also serves the replay-based VJP, which needs
    the candidate of a KNOWN winner volume rather than the min.
    """
    o_obj, d_obj = _object_space_rays(vol, o, d)
    enter, exit_, ok = _boundary_interval(vol, o_obj, d_obj)

    # volumes.rs:44-53: clamp entry to the search window, reject empty spans.
    t1c = jnp.maximum(enter, t_min)
    ok = ok & (t1c < exit_) & vol.valid[None, :]
    t1c = jnp.maximum(t1c, 0.0)

    ray_len = jnp.sqrt(dot(d, d))[:, None]                 # (B,1)
    dist_inside = (exit_ - t1c) * ray_len

    nvol = vol.vtype.shape[0]
    salts = jnp.uint32(rt_rng.SALT_VOLUME) + jnp.arange(nvol, dtype=jnp.uint32)
    u = rt_rng.rand4(seed, ray_id[:, None], depth, salts[None, :])[..., 0]
    u = jnp.clip(u, 1e-12, 1.0)
    log_u = jnp.log(u) * (_LN10_INV if use_log10 else 1.0)  # volumes.rs:58 quirk
    hit_distance = vol.neg_inv_density[None, :] * log_u

    hit = ok & (hit_distance <= dist_inside)
    return jnp.where(hit, t1c + hit_distance / ray_len, _INF)


def hit_volumes(vol: Volumes, o: Array, d: Array, t_min: float,
                seed, ray_id: Array, depth,
                *, use_log10: bool = True) -> tuple[Array, Array]:
    """Sample per-ray medium scatter candidates -> (t (B,), idx (B,))."""
    t = volume_candidates(vol, o, d, t_min, seed, ray_id, depth,
                          use_log10=use_log10)
    idx = jnp.argmin(t, axis=-1)
    return jnp.min(t, axis=-1), idx


def volume_record(vol: Volumes, idx: Array, o: Array, d: Array, t: Array):
    """Synthetic hit record (volumes.rs:64-68): arbitrary fixed normal
    (1,0,0), front_face=True, UV (0,0)."""
    p = ray_at(o, d, t)
    outward = jnp.zeros_like(p).at[..., 0].set(1.0)
    u = jnp.zeros(t.shape, p.dtype)
    v = jnp.zeros(t.shape, p.dtype)
    return p, outward, u, v, vol.mat[idx]
