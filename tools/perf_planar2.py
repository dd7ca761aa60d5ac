"""TPU session 2: chunked mesh scenes + bigger tiles + volume scene perf."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.models.scenes import (
    cornell_box, jumpy_balls, smokey_cornell_box, wavefront_cow_obj,
    wavefront_suspension_obj)
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
        print(f"{label:30s} frame_s={dt:.4f}  seg/s={segs/dt/1e6:8.1f}M"
              f"  segs={segs}  (compile {compile_s:.1f}s)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label:30s} FAILED: {type(e).__name__}: {str(e)[:200]}",
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
    sc, st, cfg, cam, n = setup(wavefront_cow_obj, 400, 225)
    print(f"# device: {jax.devices()[0]}  init+build {time.time()-t0:.0f}s",
          flush=True)

    # -- cow (5,806 planar prims, chunked) ------------------------------------
    for tb in (1024, 2048):
        run(sc, st, cfg, cam, n, seed, f"cow 400x225x16 tile{tb}",
            tile_override=tb)
    run(sc, st, cfg, cam, n, seed, "cow 400x225x16 t1024 rc1024",
        tile_override=1024, r_chunk_override=1024)

    # -- suspension (17,190 tris) ---------------------------------------------
    sc, st, cfg, cam, n = setup(wavefront_suspension_obj, 400, 225)
    run(sc, st, cfg, cam, n, seed, "suspension 400x225x16 t1024",
        tile_override=1024)

    # -- cornell: larger tiles -------------------------------------------------
    sc, st, cfg, cam, n = setup(cornell_box, 400, 400)
    for tb in (4096, 8192):
        run(sc, st, cfg, cam, n, seed, f"cornell 400x400x16 tile{tb}",
            tile_override=tb)

    # -- smokey cornell (volumes) ----------------------------------------------
    sc, st, cfg, cam, n = setup(smokey_cornell_box, 400, 400)
    for tb in (2048, 4096):
        run(sc, st, cfg, cam, n, seed, f"smokey 400x400x16 tile{tb}",
            tile_override=tb)

    # -- jumpy: bigger tile ------------------------------------------------------
    sc, st, cfg, cam, n = setup(jumpy_balls, 400, 225, seed=0)
    run(sc, st, cfg, cam, n, seed, "jumpy 400x225x16 tile8192",
        tile_override=8192)

    print(f"# total session {time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
