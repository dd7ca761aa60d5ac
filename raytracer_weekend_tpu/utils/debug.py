"""Scene validation + numerical self-checks.

The reference gets safety structurally from Rust ownership (SURVEY.md §5.2);
the JAX rebuild is race-free by construction, so its failure modes are
numerical (NaN/inf) and referential (bad table indices). `validate_scene`
audits a compiled scene the way the reference's type system would have;
`check_render_finite` is the jax_debug_nans analog scoped to one render.
"""

from __future__ import annotations

import numpy as np


class SceneValidationError(ValueError):
    pass


def validate_scene(scene, static) -> None:
    """Raise SceneValidationError on inconsistent tables."""
    errs = []

    def finite(name, arr):
        if not np.isfinite(np.asarray(arr)).all():
            errs.append(f"{name} contains NaN/inf")

    def idx_in(name, arr, n):
        a = np.asarray(arr)
        if a.size and (a.min() < 0 or a.max() >= n):
            errs.append(f"{name} indexes out of range [0,{n})")

    n_mat = int(np.asarray(scene.materials.mtype).shape[0])
    n_tex = int(np.asarray(scene.textures.ttype).shape[0])

    for fam in ("spheres", "rects", "triangles", "volumes"):
        table = getattr(scene, fam)
        for field in table._fields:
            if field == "valid":
                continue
            arr = getattr(table, field)
            if np.asarray(arr).dtype.kind == "f":
                finite(f"{fam}.{field}", arr)
        idx_in(f"{fam}.mat", table.mat, n_mat)

    idx_in("materials.tex", scene.materials.tex, n_tex)
    finite("materials.fuzz", scene.materials.fuzz)
    fuzz = np.asarray(scene.materials.fuzz)
    if (fuzz > 1.0 + 1e-6).any():
        errs.append("metal fuzz > 1 (reference asserts fuzz <= 1, "
                    "material.rs:70-74)")
    ior = np.asarray(scene.materials.ior)
    if (ior <= 0).any():
        errs.append("non-positive IOR")
    finite("textures.color1", scene.textures.color1)
    finite("textures.images", scene.textures.images)

    sp = scene.spheres
    if (np.asarray(sp.t1) - np.asarray(sp.t0) == 0).any():
        errs.append("sphere t1 == t0 (center_at_time division by zero)")

    if errs:
        raise SceneValidationError("; ".join(errs))


def check_render_finite(scene, static, cfg, cam, n_lanes: int = 1024):
    """Trace a small lane sample and assert finite radiance (debug aid)."""
    import jax.numpy as jnp

    from raytracer_weekend_tpu import integrator

    ids = jnp.arange(min(n_lanes, cfg.n_rays), dtype=jnp.int32)
    colors = np.asarray(integrator.render_chunk(scene, static, cfg, cam, ids,
                                                jnp.uint32(cfg.seed)))
    bad = ~np.isfinite(colors).all(axis=-1)
    if bad.any():
        raise FloatingPointError(
            f"{bad.sum()}/{len(bad)} lanes produced non-finite radiance; "
            f"first bad lane {int(np.argmax(bad))}")
    return colors
