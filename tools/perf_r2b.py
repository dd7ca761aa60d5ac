"""TPU session 4: mesh-scene compile triage (r_chunk sweep) + tile fills.

Session 3 (perf_r2.py): cow/suspension crash the TPU compiler (remote
HTTP 500, helper exit 1) at the default r_chunk=2048 — suspicion: the
per-chunk matmul outputs are stacked (3*rc, L)/(4*rc, L) planes, so the
rc budget must account for the 4x stacking, not (rc, L) alone.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.models.scenes import (
    simple_triangle, smokey_cornell_box, wavefront_cow_obj,
    wavefront_suspension_obj)
from raytracer_weekend_tpu.ops.pallas import render_fused
from raytracer_weekend_tpu.scene import builder as B

REPS = 5


def run(scene, static, cfg, cam, n, seed, label, **kw):
    try:
        t0 = time.time()
        rad, seg = render_fused(scene, cfg, cam, 0, n, seed, static=static,
                                **kw)
        jax.block_until_ready((rad, seg))
        compile_s = time.time() - t0
        segs = int(seg.sum())
        t0 = time.time()
        outs = [render_fused(scene, cfg, cam, 0, n, seed, static=static,
                             **kw) for _ in range(REPS)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / REPS
        print(f"{label:34s} frame_s={dt:.4f}  seg/s={segs/dt/1e6:8.1f}M"
              f"  segs={segs}  (compile {compile_s:.1f}s)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label:34s} FAILED: {type(e).__name__}: {str(e)[:160]}",
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

    # simple_triangle: smallest planar scene — does ANY planar scene still
    # compile on TPU, or did planar break entirely?
    sc, st, cfg, cam, n = setup(simple_triangle, 200, 112)
    print(f"# device: {jax.devices()[0]}  init+build {time.time()-t0:.0f}s",
          flush=True)
    run(sc, st, cfg, cam, n, seed, "simple_triangle t2048")

    # cow: r_chunk sweep, small to large
    sc, st, cfg, cam, n = setup(wavefront_cow_obj, 400, 225)
    for rc in (256, 512, 1024):
        run(sc, st, cfg, cam, n, seed, f"cow t1024 rc{rc}",
            tile_override=1024, r_chunk_override=rc)
    run(sc, st, cfg, cam, n, seed, "cow t2048 rc256",
        tile_override=2048, r_chunk_override=256)

    # suspension at the winning cow rc
    sc, st, cfg, cam, n = setup(wavefront_suspension_obj, 400, 225)
    for rc in (256, 512):
        run(sc, st, cfg, cam, n, seed, f"suspension t1024 rc{rc}",
            tile_override=1024, r_chunk_override=rc)

    # smokey at tile 8192 (cornell won at 8192; smokey only measured to 4096)
    sc, st, cfg, cam, n = setup(smokey_cornell_box, 400, 400)
    run(sc, st, cfg, cam, n, seed, "smokey 400x400x16 tile8192",
        tile_override=8192)

    print(f"# total session {time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
