"""CPU reference images for the r2c TPU parity session (run BEFORE perf_r2c).

Renders small-config staged-path (ground truth) images on CPU and saves
them as .npy under /tmp/r2c_ref/ for perf_r2c.py to compare against on
the real chip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from raytracer_weekend_tpu import integrator
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.models.scenes import SCENES
from raytracer_weekend_tpu.scene import builder as B

# (scene, w, h, spp, depth) — must match perf_r2c.PARITY exactly.
PARITY = [
    ("wavefront_cow_obj", 96, 54, 2, 6),
    ("wavefront_suspension_obj", 96, 54, 2, 6),
    ("book2_final_scene", 40, 22, 4, 6),
    ("earth", 64, 36, 4, 6),
    ("two_perlin_spheres", 64, 36, 4, 6),
    ("simple_light", 64, 36, 4, 6),
]

OUT = "/tmp/r2c_ref"


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    for name, w, h, spp, depth in PARITY:
        t0 = time.time()
        cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                           max_depth=depth, seed=7)
        objs, cams, bg = SCENES[name](cfg.aspect_ratio)
        scene, static = B.build_scene(objs, background=bg, seed=7)
        ids = jnp.arange(cfg.n_rays, dtype=jnp.int32)
        seed = jnp.uint32(7)
        o, d, t, rid = integrator._pixel_rays(cams[0], cfg, ids, seed)
        rad = integrator.trace_rays(scene, static, cfg, o, d, t, rid, seed)
        np.save(f"{OUT}/{name}.npy", np.asarray(rad))
        print(f"{name:28s} {time.time()-t0:6.1f}s  mean={float(rad.mean()):.4f}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
