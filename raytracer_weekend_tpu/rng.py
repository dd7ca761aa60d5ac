"""Counter-based RNG and closed-form samplers.

The reference threads a stateful RNG (ThreadRng / seeded SmallRng, lib.rs:34-38)
through every scatter and uses rejection sampling for sphere/disk points
(vec3.rs:101-131). Neither survives contact with XLA: stateful streams break
under `vmap`/`shard_map`, and rejection loops are data-dependent control flow.

TPU-native replacement:
  * a stateless counter-based hash (PCG4D, Jarzynski & Olano, JCGT 2020,
    "Hash Functions for GPU Rendering") keyed on
    (seed, ray_id, depth, site-salt). Every lane of a megabatch draws its own
    independent stream, identical under any batch order or device sharding.
  * closed-form samplers with exactly the same *distributions* as the
    reference's rejection loops (uniform-on-sphere, uniform-in-ball,
    uniform-in-disk) — fixed control flow, fully vectorized.

All returned floats are in [0, 1) with 24-bit resolution, matching the range
of Rust's `rng.gen::<f32>()`.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

# Salts: one per RNG consumption site so streams never collide.
SALT_PIXEL_JITTER = 0x9E3779B1
SALT_LENS = 0x85EBCA77
SALT_TIME = 0xC2B2AE3D
SALT_LAMBERTIAN = 0x27D4EB2F
SALT_METAL = 0x165667B1
SALT_DIELECTRIC = 0xD3A2646C
SALT_ISOTROPIC = 0xFD7046C5
SALT_VOLUME = 0xB55A4F09  # + volume index


def _u32(x) -> Array:
    if isinstance(x, int):  # large Python salts overflow the int32 default path
        return jnp.uint32(x & 0xFFFFFFFF)
    return jnp.asarray(x).astype(jnp.uint32)


def pcg4d(x: Array, y: Array, z: Array, w: Array) -> tuple[Array, Array, Array, Array]:
    """PCG4D mixing function: 4 x uint32 counters -> 4 x uint32 hashes.

    Public-domain construction from "Hash Functions for GPU Rendering"
    (Jarzynski & Olano). uint32 arithmetic wraps mod 2^32 under XLA.
    """
    v0, v1, v2, v3 = _u32(x), _u32(y), _u32(z), _u32(w)
    mul = jnp.uint32(1664525)
    add = jnp.uint32(1013904223)
    v0 = v0 * mul + add
    v1 = v1 * mul + add
    v2 = v2 * mul + add
    v3 = v3 * mul + add
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


def _to_unit_float(bits: Array) -> Array:
    """uint32 -> f32 in [0, 1) using the top 24 bits."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def rand4(seed, ray_id: Array, depth, salt) -> Array:
    """Four independent uniforms in [0,1) per lane, shape (..., 4).

    Keyed on (seed, ray_id, depth, salt): any lane draws the same numbers
    regardless of batch order, chunking, or device sharding — the
    counter-based analog of the reference's per-task RNGs (lib.rs:62-66).
    """
    b0, b1, b2, b3 = pcg4d(ray_id, depth, salt, seed)
    return jnp.stack(
        [_to_unit_float(b0), _to_unit_float(b1), _to_unit_float(b2), _to_unit_float(b3)],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Closed-form samplers (same distributions as vec3.rs rejection loops)
# ---------------------------------------------------------------------------

_TWO_PI = 2.0 * jnp.pi


def unit_vector_from_uniforms(u1: Array, u2: Array) -> Array:
    """Uniform direction on the unit sphere from two uniforms.

    Same distribution as `random_unit_vector` (vec3.rs:110-112 — normalized
    rejection sample in the ball). z = 1-2u is exact by Archimedes' theorem.
    """
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = _TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def in_unit_sphere_from_uniforms(u1: Array, u2: Array, u3: Array) -> Array:
    """Uniform point in the unit ball (ref rejection loop vec3.rs:101-108).

    Radius is cbrt(u) because volume grows as r^3.
    """
    direction = unit_vector_from_uniforms(u1, u2)
    radius = jnp.cbrt(u3)
    return direction * radius[..., None]


def in_unit_disk_from_uniforms(u1: Array, u2: Array) -> Array:
    """Uniform point in the unit disk, z=0 (ref rejection loop vec3.rs:124-131)."""
    r = jnp.sqrt(u1)
    phi = _TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), jnp.zeros_like(r)], axis=-1)
