"""Perlin noise over megabatches of 3D points.

Rebuild of perlin.rs: 256 random unit gradients plus three independent
permutation tables; the lattice hash is the XOR of the per-axis permutations
at `floor(p)+offset & 255` (perlin.rs:57-72), interpolation is
Hermite-smoothed trilinear over gradient dots (perlin.rs:91-122), and
turbulence sums |Σ 0.5^k · noise(2^k p)| (perlin.rs:77-89).

The tables are plain arrays generated host-side (numpy) at scene build; the
noise itself is pure gather + VPU math, vectorized over (..., 3) points.

Reference quirk kept for parity: perlin.rs applies the Hermite filter to the
cell-local point *before* computing both the blend factor and the gradient
offset vector `weight_v` (perlin.rs:104-118) — unlike the book, which uses
the unfiltered point for `weight_v`. We match the reference.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import Array

POINT_COUNT = 256

# The 8 lattice-cell corner offsets, in (x, y, z).
_CORNERS = np.array(
    [[i, j, k] for i in range(2) for j in range(2) for k in range(2)],
    dtype=np.int32,
)  # (8, 3)


def make_perlin_tables(seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Generate gradient + permutation tables (ref Perlin::new, perlin.rs:15-29).

    Gradients are random points in [-1,1)^3 normalized to unit length
    (vec3.rs random_min_max + unit_vector); permutations are three
    independent shuffles of 0..255.
    """
    rng = np.random.default_rng(seed)
    g = rng.uniform(-1.0, 1.0, size=(POINT_COUNT, 3)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    perms = np.stack(
        [rng.permutation(POINT_COUNT) for _ in range(3)]
    ).astype(np.int32)  # (3, 256)
    return g, perms


def noise(gradients: Array, perms: Array, p: Array) -> Array:
    """Perlin noise at points p (..., 3) -> (...,). Ref: perlin.rs:50-75."""
    pf = jnp.floor(p)
    base = pf.astype(jnp.int32)           # (..., 3)
    frac = p - pf                          # (..., 3) in [0,1)

    corners = jnp.asarray(_CORNERS)        # (8, 3)
    # Lattice coordinates per corner, wrapped to the table (ref: `& 255` after
    # wrapping add, perlin.rs:63-65 — int32 AND 255 matches two's-complement wrap).
    lattice = (base[..., None, :] + corners) & (POINT_COUNT - 1)  # (..., 8, 3)

    # hash = perm_x[ix] ^ perm_y[iy] ^ perm_z[iz]   (perlin.rs:66-70)
    hx = perms[0][lattice[..., 0]]
    hy = perms[1][lattice[..., 1]]
    hz = perms[2][lattice[..., 2]]
    h = (hx ^ hy ^ hz) & (POINT_COUNT - 1)
    grad = gradients[h]                    # (..., 8, 3)

    # Hermite smoothing of the cell-local point (perlin.rs:120-122), applied
    # before both the blend and the offset vectors (reference quirk, see top).
    u = frac * frac * (3.0 - 2.0 * frac)   # (..., 3)

    cf = corners.astype(jnp.float32)       # (8, 3)
    weight_v = u[..., None, :] - cf        # (..., 8, 3)
    blend = jnp.prod(
        cf * u[..., None, :] + (1.0 - cf) * (1.0 - u[..., None, :]), axis=-1
    )                                      # (..., 8)
    return jnp.sum(blend * jnp.sum(grad * weight_v, axis=-1), axis=-1)


def turbulence(gradients: Array, perms: Array, p: Array, depth: int = 7) -> Array:
    """|Σ_k 0.5^k · noise(2^k p)|. Ref: perlin.rs:77-89."""
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    temp_p = p
    weight = 1.0
    for _ in range(depth):
        accum = accum + weight * noise(gradients, perms, temp_p)
        weight *= 0.5
        temp_p = temp_p * 2.0
    return jnp.abs(accum)
