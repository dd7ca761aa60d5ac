"""Megakernel tile-size sweep on the live backend (single process).

Usage: python tools/sweep_tile.py [tile_b ...]   (defaults below)
Prints one line per tile size: tile_b, frame_s, segments/s.
NOTE: single-client TPU tunnel — never run concurrently with another
TPU-backend JAX process (CLAUDE.md).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.models.scenes import jumpy_balls
from raytracer_weekend_tpu.ops.pallas import render_fused
from raytracer_weekend_tpu.scene import builder as B


def main() -> int:
    tiles = [int(a) for a in sys.argv[1:]] or [256, 512, 1024, 2048]
    cfg = RenderConfig(width=400, height=225, samples_per_pixel=16,
                       max_depth=8, seed=0, ray_batch=0)
    objs, cams, background = jumpy_balls(cfg.aspect_ratio, seed=0)
    scene, static = B.build_scene(objs, background=background, seed=cfg.seed)
    cam = cams[0]
    n = cfg.n_rays
    seed = jnp.uint32(0)
    print(f"# device: {jax.devices()[0]}  lanes={n}", flush=True)

    for tb in tiles:
        try:
            t0 = time.time()
            rad, seg = render_fused(scene, cfg, cam, 0, n, seed,
                                    tile_override=tb)
            jax.block_until_ready((rad, seg))
            compile_s = time.time() - t0
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                rad, seg = render_fused(scene, cfg, cam, 0, n, seed,
                                        tile_override=tb)
                jax.block_until_ready((rad, seg))
            dt = (time.time() - t0) / reps
            segs = int(seg.sum())
            print(f"tile_b={tb:5d}  frame_s={dt:.4f}  seg/s={segs/dt/1e6:8.1f}M"
                  f"  (compile {compile_s:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"tile_b={tb:5d}  FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
