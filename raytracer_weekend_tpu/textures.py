"""Table-driven textures evaluated over ray megabatches.

Rebuild of texture.rs + image_texture.rs + the Perlin Noise texture. The
reference dispatches through generic `Texture` trait objects; here a scene
carries one `TextureTable` (SoA pytree) and evaluation is a branchless
per-lane select over the texture type id — the TPU analog of virtual
dispatch. All fields (colors, texels) are differentiable leaves.

Types:
  0 SOLID    — constant color                      (texture.rs:45-60)
  1 CHECKER  — 3D sine-product checker w/ frequency (texture.rs:62-81);
               children restricted to solid colors (all reference scenes use
               solid-color checkers, scenes.rs:65-69 etc.)
  2 NOISE    — Perlin marble 0.5·(1+sin(scale·z + 10·turb)) (texture.rs:83-95)
  3 IMAGE    — bitmap fetch: clamp UV, flip V, nearest texel, /255
               (image_texture.rs:34-52); bilinear mode available for smooth
               texel gradients
  4 UVDEBUG  — (u, v, 0)                           (texture.rs:97-104)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from raytracer_weekend_tpu import perlin

SOLID = 0
CHECKER = 1
NOISE = 2
IMAGE = 3
UVDEBUG = 4


class TextureTable(NamedTuple):
    """SoA texture bank. One row per texture instance in the scene."""

    ttype: Array        # (K,)   int32 — type ids above
    color1: Array       # (K,3)  f32   — solid color / checker even
    color2: Array       # (K,3)  f32   — checker odd
    scale: Array        # (K,)   f32   — checker frequency / noise scale
    image_id: Array     # (K,)   int32 — row into the image atlas
    perlin_grad: Array  # (256,3) f32  — shared Perlin gradient table
    perlin_perm: Array  # (3,256) int32 — shared Perlin permutation tables
    images: Array       # (I,H,W,3) f32 — image atlas (padded to max H,W)
    image_hw: Array     # (I,2)  int32 — actual (height, width) per image


def texture_value(
    table: TextureTable,
    tex_id: Array,      # (B,) int32
    u: Array,           # (B,)
    v: Array,           # (B,)
    p: Array,           # (B,3)
    *,
    has_noise: bool = True,
    has_image: bool = True,
    bilinear: bool = False,
    pallas_noise: bool = False,
    live: Array | None = None,
) -> Array:
    """Evaluate per-lane texture color -> (B,3).

    `has_noise`/`has_image` are static flags (from SceneStatic) that let XLA
    skip the expensive gather paths entirely for scenes without them.
    `pallas_noise` swaps the Perlin turbulence for the one-hot-matmul Pallas
    kernel (ops.pallas.perlin_turb) — forward-only, ~200x faster than XLA's
    serial gathers on TPU; keep it off on paths that differentiate.
    """
    ttype = table.ttype[tex_id]          # (B,)
    c1 = table.color1[tex_id]            # (B,3)
    c2 = table.color2[tex_id]
    scale = table.scale[tex_id]          # (B,)

    # SOLID
    out = c1

    # CHECKER (texture.rs:71-80): sines = Π sin(freq·p_axis); odd if < 0.
    sines = jnp.prod(jnp.sin(scale[..., None] * p), axis=-1)
    checker = jnp.where(sines[..., None] < 0.0, c2, c1)
    out = jnp.where((ttype == CHECKER)[..., None], checker, out)

    # NOISE marble (texture.rs:90-94).
    if has_noise:
        if pallas_noise:
            from raytracer_weekend_tpu.ops.pallas.perlin_turb import (
                turbulence_pallas_diff)
            # Liveness mask: lets the kernel skip all-dead point tiles
            # (`live` marks consumed lanes — deferred records past a
            # path's death; dead outputs are masked by the callers).
            # The diff wrapper pairs the forward kernel with the
            # hand-derived VJP kernel, so this path is differentiable
            # (fused_diff's deferred backward uses it: the XLA
            # turbulence vjp measured ~2 s per 1M records on v5e).
            nz = ttype == NOISE
            lv = (nz if live is None else (live & nz)).reshape(-1)
            turb = turbulence_pallas_diff(
                table.perlin_grad, table.perlin_perm,
                p.reshape(-1, 3), depth=7,
                live=lv).reshape(p.shape[:-1])
        else:
            turb = perlin.turbulence(table.perlin_grad, table.perlin_perm,
                                     p, depth=7)
        marble = 0.5 * (1.0 + jnp.sin(scale * p[..., 2] + 10.0 * turb))
        out = jnp.where((ttype == NOISE)[..., None], marble[..., None] * jnp.ones(3), out)

    # IMAGE (image_texture.rs:34-52).
    if has_image:
        img = _image_fetch(table, table.image_id[tex_id], u, v, bilinear=bilinear)
        out = jnp.where((ttype == IMAGE)[..., None], img, out)

    # UVDEBUG (texture.rs:101-103).
    uvdbg = jnp.stack([u, v, jnp.zeros_like(u)], axis=-1)
    out = jnp.where((ttype == UVDEBUG)[..., None], uvdbg, out)

    return out


def _image_fetch(table: TextureTable, img_id: Array, u: Array, v: Array,
                 *, bilinear: bool) -> Array:
    """Texel fetch from the atlas.

    Nearest mode reproduces image_texture.rs:34-52 exactly: clamp UV to [0,1],
    flip V, truncate to texel, clamp to edge, /255 (already applied when the
    atlas was built). Bilinear mode gives smooth, useful gradients w.r.t. UV
    and is the default for inverse rendering.
    """
    # Per-record image dims via unrolled selects, NOT a gather: XLA's TPU
    # gather costs ~10 cycles/INDEX on the scalar unit and the deferred
    # combine fetches for B*D records; every catalog scene has <= 4
    # images, so I selects beat 2 gathered indices per record.
    n_img, ph, pw = table.images.shape[0:3]
    hw_np = table.image_hw.astype(jnp.float32)
    h = jnp.full(img_id.shape, hw_np[0, 0])
    w = jnp.full(img_id.shape, hw_np[0, 1])
    for k in range(1, n_img):
        h = jnp.where(img_id == k, hw_np[k, 0], h)
        w = jnp.where(img_id == k, hw_np[k, 1], w)

    uc = jnp.clip(u, 0.0, 1.0)
    vc = 1.0 - jnp.clip(v, 0.0, 1.0)
    flat_img = table.images.reshape(n_img * ph * pw, 3)

    def fetch(j, i):
        # ONE linearized index per record instead of (img, row, col)
        # advanced indexing — measured 106 ms for 11.5M records on v5e
        # in the multi-component form.
        return flat_img[(img_id * ph + j) * pw + i]

    if not bilinear:
        i = jnp.clip((uc * w).astype(jnp.int32), 0, (w - 1).astype(jnp.int32))
        j = jnp.clip((vc * h).astype(jnp.int32), 0, (h - 1).astype(jnp.int32))
        return fetch(j, i)

    # Bilinear: sample at texel centers, clamp to edge.
    x = uc * w - 0.5
    y = vc * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    xi0 = jnp.clip(x0.astype(jnp.int32), 0, (w - 1).astype(jnp.int32))
    yi0 = jnp.clip(y0.astype(jnp.int32), 0, (h - 1).astype(jnp.int32))
    xi1 = jnp.clip(xi0 + 1, 0, (w - 1).astype(jnp.int32))
    yi1 = jnp.clip(yi0 + 1, 0, (h - 1).astype(jnp.int32))
    c00 = fetch(yi0, xi0)
    c01 = fetch(yi0, xi1)
    c10 = fetch(yi1, xi0)
    c11 = fetch(yi1, xi1)
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy
