"""One-process TPU perf session: wide-lane jumpy number + planar scenes.

Measures (a) the wide-lane (8,L) megakernel on the headline random-spheres
config (BENCH_NOTES.md round-1 number to record), (b) the new unified
planar family on cornell_box and the cow mesh, with a small tile sweep
each. Single axon tunnel client — never run concurrently with another
TPU-backend JAX process (CLAUDE.md).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.models.scenes import (
    cornell_box, jumpy_balls, wavefront_cow_obj)
from raytracer_weekend_tpu.ops.pallas import render_fused
from raytracer_weekend_tpu.scene import builder as B


def run(scene, static, cfg, cam, n, seed, label, **kw):
    try:
        t0 = time.time()
        rad, seg = render_fused(scene, cfg, cam, 0, n, seed, static=static,
                                **kw)
        jax.block_until_ready((rad, seg))
        compile_s = time.time() - t0
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            rad, seg = render_fused(scene, cfg, cam, 0, n, seed,
                                    static=static, **kw)
            jax.block_until_ready((rad, seg))
        dt = (time.time() - t0) / reps
        segs = int(seg.sum())
        print(f"{label:28s} frame_s={dt:.4f}  seg/s={segs/dt/1e6:8.1f}M"
              f"  segs={segs}  (compile {compile_s:.1f}s)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label:28s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def setup(scenef, w, h, spp=16, depth=8, **kw):
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                       max_depth=depth, seed=0, ray_batch=0)
    objs, cams, background = scenef(cfg.aspect_ratio, **kw)
    scene, static = B.build_scene(objs, background=background, seed=0)
    return scene, static, cfg, cams[0], cfg.n_rays


def main() -> int:
    t0 = time.time()
    seed = jnp.uint32(0)
    sc, st, cfg, cam, n = setup(jumpy_balls, 400, 225, seed=0)
    print(f"# device: {jax.devices()[0]}  init+build {time.time()-t0:.0f}s",
          flush=True)

    # -- headline: random-spheres, wide-lane kernel --------------------------
    for tb in (1024, 2048, 4096):
        run(sc, st, cfg, cam, n, seed, f"jumpy 400x225x16 tile{tb}",
            tile_override=tb)

    # -- cornell (6 rects + 24 tris, planar family) ---------------------------
    sc, st, cfg, cam, n = setup(cornell_box, 400, 400)
    for tb in (1024, 2048, 4096):
        run(sc, st, cfg, cam, n, seed, f"cornell 400x400x16 tile{tb}",
            tile_override=tb)

    # -- cow mesh (5,804 tris brute-force on MXU) -----------------------------
    sc, st, cfg, cam, n = setup(wavefront_cow_obj, 400, 225)
    for tb in (1024, 2048):
        run(sc, st, cfg, cam, n, seed, f"cow 400x225x16 tile{tb}",
            tile_override=tb)

    print(f"# total session {time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
