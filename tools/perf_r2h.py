"""TPU session 9 (round-2 wrap-up), priority-ordered so a hard timeout
still yields the high-value artifacts first:

1. book2_final_scene 400x225x16 d8 fused seg/s  (VERDICT item 4 target:
   >=100M despite 1000+ spheres / 2400 rects -> in-kernel chunk culling)
2. textured_monument 1080p render (BASELINE config 5; PNG -> docs/)
3. cow / suspension / monument 400x225 fused timings (mesh on-chip proof)

One process = one axon client init. Results append to stdout; the caller
tees to /tmp/perf_r2h.log and BENCH_NOTES records them.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.models.scenes import SCENES
from raytracer_weekend_tpu.ops.pallas import render_fused
from raytracer_weekend_tpu.scene import builder as B


def setup(name, w, h, spp, depth, seed=0):
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                       max_depth=depth, seed=seed, ray_batch=0)
    objs, cams, bg = SCENES[name](cfg.aspect_ratio)
    scene, static = B.build_scene(objs, background=bg, seed=seed)
    return scene, static, cfg, cams[0]


def timed(name, w, h, spp, depth, reps):
    try:
        scene, static, cfg, cam = setup(name, w, h, spp, depth)
        seed = jnp.uint32(0)
        n = cfg.n_rays
        t1 = time.time()
        rad, seg = render_fused(scene, cfg, cam, 0, n, seed, static=static)
        jax.block_until_ready((rad, seg))
        compile_s = time.time() - t1
        segs = int(seg.sum())
        t1 = time.time()
        outs = [render_fused(scene, cfg, cam, 0, n, seed, static=static)
                for _ in range(reps)]
        jax.block_until_ready(outs)
        dt = (time.time() - t1) / reps
        print(f"time {name:28s} {w}x{h}x{spp}d{depth} frame_s={dt:.4f} "
              f"seg/s={segs / dt / 1e6:8.1f}M segs={segs} "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"time {name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def monument_1080p(spp=8, depth=8):
    from raytracer_weekend_tpu.utils.image import save_png, tone_map

    try:
        scene, static, cfg, cam = setup("textured_monument", 1920, 1080,
                                        spp, depth)
        seed = jnp.uint32(0)
        n = cfg.n_rays
        chunk = 1 << 20                       # divisible by spp=8
        t1 = time.time()
        # compile once on the first chunk
        r0, s0 = render_fused(scene, cfg, cam, 0, chunk, seed, static=static)
        jax.block_until_ready((r0, s0))
        compile_s = time.time() - t1

        t1 = time.time()
        sums, segs = [], 0
        for start in range(0, n, chunk):
            m = min(chunk, n - start)
            rad, seg = render_fused(scene, cfg, cam, start, m, seed,
                                    static=static)
            # device-side pixel reduce: ship 400 KB/chunk, not 12 MB
            sums.append(rad.reshape(-1, spp, 3).sum(axis=1))
            segs += seg.sum()
        jax.block_until_ready(sums)
        dt = time.time() - t1
        segs = int(segs)
        img = np.concatenate([np.asarray(s) for s in sums], axis=0)
        img = img.reshape(cfg.height, cfg.width, 3)
        save_png("/root/repo/docs/monument_1080p.png", tone_map(img, spp))
        print(f"monument_1080p 1920x1080x{spp}d{depth} frame_s={dt:.2f} "
              f"seg/s={segs / dt / 1e6:8.1f}M segs={segs} "
              f"(compile {compile_s:.0f}s) -> docs/monument_1080p.png",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"monument_1080p FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def main() -> int:
    t0 = time.time()
    print(f"# device: {jax.devices()[0]}", flush=True)
    print(f"# init {time.time() - t0:.0f}s", flush=True)
    timed("book2_final_scene", 400, 225, 16, 8, 3)
    monument_1080p()
    timed("wavefront_cow_obj", 400, 225, 16, 8, 3)
    timed("wavefront_suspension_obj", 400, 225, 16, 8, 3)
    timed("textured_monument", 400, 225, 16, 8, 3)
    print("# total session {:.0f}s".format(time.time() - t0), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
