"""Vector math over trailing-axis-3 arrays.

TPU-native counterpart of the reference's GenericVec3 (vec3.rs:15-356): every
op is written over `(..., 3)` jnp arrays so a "vector" is a whole SoA
megabatch lane set, not a scalar struct. All ops are pure and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def dot(a: Array, b: Array) -> Array:
    """Batched dot product. Ref: vec3.rs:46-50. Returns (...,)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: Array, b: Array) -> Array:
    """Batched cross product. Ref: vec3.rs:52-56."""
    return jnp.cross(a, b)


def length_squared(a: Array) -> Array:
    return jnp.sum(a * a, axis=-1)


def length(a: Array) -> Array:
    return jnp.sqrt(length_squared(a))


def normalize(a: Array, eps: float = 0.0) -> Array:
    """Unit vector, ref `unit_vector` (vec3.rs). `eps` guards 0-length grads."""
    return a / jnp.sqrt(length_squared(a) + eps)[..., None]


def near_zero(a: Array, s: float = 1e-8) -> Array:
    """True where the vector is ~zero in all dimensions. Ref: vec3.rs:133-138."""
    return jnp.all(jnp.abs(a) < s, axis=-1)


def reflect(v: Array, n: Array) -> Array:
    """Mirror reflection about normal n. Ref: vec3.rs:140-142."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv: Array, n: Array, eta_i_over_eta_t: Array) -> Array:
    """Snell refraction of unit vector uv about unit normal n.

    Ref: vec3.rs:144-151. `eta_i_over_eta_t` broadcasts over the batch.
    """
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    eta = jnp.asarray(eta_i_over_eta_t)
    if eta.ndim < cos_theta.ndim:
        eta = jnp.broadcast_to(eta, cos_theta.shape)
    r_out_perp = eta[..., None] * (uv + cos_theta[..., None] * n)
    # max() keeps sqrt' finite at the TIR boundary (backward-pass NaN guard).
    r_out_parallel = (
        -jnp.sqrt(jnp.maximum(1e-12, jnp.abs(1.0 - length_squared(r_out_perp))))[..., None]
        * n
    )
    return r_out_perp + r_out_parallel


def ray_at(origin: Array, direction: Array, t: Array) -> Array:
    """Point along a ray: o + t*d. Ref: ray.rs:25-27."""
    return origin + t[..., None] * direction
