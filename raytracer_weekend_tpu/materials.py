"""Table-driven, branchless material scattering.

Rebuild of material.rs + light_source.rs. The reference dispatches `scatter`/
`emitted` through `dyn Material` vtables with a stateful RNG; here a scene
carries one `MaterialTable` and a megabatch of hits is shaded in one pass:
every BSDF's scatter direction is computed for every lane (cheap VPU math)
and the per-lane result selected by material type id — no divergence, no
vtables, fully differentiable w.r.t. albedo (via textures), fuzz, and IOR.

Types:
  0 LAMBERTIAN — normal + random unit vector, degenerate fix (material.rs:42-56)
  1 METAL      — mirror + fuzz·ball sample, absorbs below-surface (material.rs:77-95)
  2 DIELECTRIC — Snell + TIR + Schlick-probability reflection (material.rs:115-142)
  3 DIFFUSE_LIGHT — never scatters, emits its texture (light_source.rs:12-25)
  4 ISOTROPIC  — uniform ball direction, for volumes (material.rs:154-163)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from raytracer_weekend_tpu import rng as rt_rng
from raytracer_weekend_tpu import textures as tex_mod
from raytracer_weekend_tpu.vecmath import dot, near_zero, normalize, reflect, refract

LAMBERTIAN = 0
METAL = 1
DIELECTRIC = 2
DIFFUSE_LIGHT = 3
ISOTROPIC = 4


class MaterialTable(NamedTuple):
    """SoA material bank; one row per material instance."""

    mtype: Array  # (M,)  int32
    tex: Array    # (M,)  int32 — albedo (or emission) texture id
    fuzz: Array   # (M,)  f32   — metal fuzz (material.rs:70-74 asserts <= 1)
    ior: Array    # (M,)  f32   — dielectric index of refraction


class ScatterResult(NamedTuple):
    direction: Array    # (B,3) next ray direction (undefined where ~alive)
    attenuation: Array  # (B,3) throughput multiplier
    emitted: Array      # (B,3) radiance emitted at this hit
    alive: Array        # (B,)  bool — ray continues bouncing


def scatter(
    materials: MaterialTable,
    textures: tex_mod.TextureTable,
    mat_id: Array,     # (B,) int32 — material of the winning hit
    ray_dir: Array,    # (B,3) incoming (unnormalized) direction
    p: Array,          # (B,3) hit point
    normal: Array,     # (B,3) face normal (already front-face flipped)
    front_face: Array, # (B,)  bool
    u: Array,          # (B,)  texture u
    v: Array,          # (B,)  texture v
    seed,
    ray_id: Array,     # (B,) uint32 RNG lane counters
    depth,             # scalar bounce index (traced ok)
    *,
    has_noise: bool = True,
    has_image: bool = True,
) -> ScatterResult:
    """Shade a megabatch of hits; the vectorized union of all `scatter` impls."""
    mtype = materials.mtype[mat_id]
    fuzz = materials.fuzz[mat_id]
    ior = materials.ior[mat_id]

    # One texture lookup serves Lambertian/Isotropic albedo and light emission.
    tex_color = tex_mod.texture_value(
        textures, materials.tex[mat_id], u, v, p,
        has_noise=has_noise, has_image=has_image,
    )
    return scatter_packed(mtype, fuzz, ior, tex_color, ray_dir, p, normal,
                          front_face, seed, ray_id, depth)


def scatter_packed(
    mtype: Array,      # (B,) int32 — per-lane material type (pre-gathered)
    fuzz: Array,       # (B,) f32
    ior: Array,        # (B,) f32
    tex_color: Array,  # (B,3) evaluated albedo/emission texture
    ray_dir: Array,
    p: Array,
    normal: Array,
    front_face: Array,
    seed,
    ray_id: Array,
    depth,
) -> ScatterResult:
    """The gather-free scatter core: all per-lane material parameters are
    already resolved. Shared by `scatter` (table-gather front-end) and the
    packed replay backward (replay.py), which resolves parameters with ONE
    per-primitive row gather per bounce instead of ~30 per-field gathers."""
    unit_in = normalize(ray_dir, eps=1e-20)

    # --- Lambertian (material.rs:42-56) -----------------------------------
    ul = rt_rng.rand4(seed, ray_id, depth, rt_rng.SALT_LAMBERTIAN)
    lam_dir = normal + rt_rng.unit_vector_from_uniforms(ul[..., 0], ul[..., 1])
    lam_dir = jnp.where(near_zero(lam_dir)[..., None], normal, lam_dir)

    # --- Metal (material.rs:77-95) ----------------------------------------
    um = rt_rng.rand4(seed, ray_id, depth, rt_rng.SALT_METAL)
    met_dir = reflect(unit_in, normal) + fuzz[..., None] * (
        rt_rng.in_unit_sphere_from_uniforms(um[..., 0], um[..., 1], um[..., 2])
    )
    met_alive = dot(met_dir, normal) > 0.0

    # --- Dielectric (material.rs:115-142) ---------------------------------
    ud = rt_rng.rand4(seed, ray_id, depth, rt_rng.SALT_DIELECTRIC)[..., 0]
    ratio = jnp.where(front_face, 1.0 / ior, ior)
    cos_theta = jnp.minimum(dot(-unit_in, normal), 1.0)
    # max() keeps sqrt' finite at normal incidence (0*inf -> NaN in backward).
    sin_theta = jnp.sqrt(jnp.maximum(1e-12, 1.0 - cos_theta * cos_theta))
    cannot_refract = ratio * sin_theta > 1.0
    r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5  # Schlick, material.rs:108-113
    reflect_choice = cannot_refract | (reflectance > ud)
    die_dir = jnp.where(
        reflect_choice[..., None],
        reflect(unit_in, normal),
        refract(unit_in, normal, ratio),
    )

    # --- Isotropic (material.rs:154-163) ----------------------------------
    ui = rt_rng.rand4(seed, ray_id, depth, rt_rng.SALT_ISOTROPIC)
    iso_dir = rt_rng.in_unit_sphere_from_uniforms(ui[..., 0], ui[..., 1], ui[..., 2])

    # --- Select by material type ------------------------------------------
    is_lam = (mtype == LAMBERTIAN)[..., None]
    is_met = (mtype == METAL)[..., None]
    is_die = (mtype == DIELECTRIC)[..., None]
    is_iso = (mtype == ISOTROPIC)[..., None]
    is_light = mtype == DIFFUSE_LIGHT

    direction = jnp.where(is_lam, lam_dir, lam_dir)
    direction = jnp.where(is_met, met_dir, direction)
    direction = jnp.where(is_die, die_dir, direction)
    direction = jnp.where(is_iso, iso_dir, direction)

    white = jnp.ones_like(tex_color)
    attenuation = jnp.where(is_die, white, tex_color)
    attenuation = jnp.where(is_light[..., None], jnp.zeros_like(tex_color), attenuation)

    emitted = jnp.where(is_light[..., None], tex_color, jnp.zeros_like(tex_color))

    # Lights terminate (scatter -> None, light_source.rs:18-20); metal absorbs
    # below-surface scatters (material.rs:86-94); everything else continues.
    alive = ~is_light
    alive = jnp.where(mtype == METAL, met_alive, alive)
    return ScatterResult(direction=direction, attenuation=attenuation,
                         emitted=emitted, alive=alive)
