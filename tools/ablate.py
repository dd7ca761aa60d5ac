"""Megakernel timing ablations on the live backend (single process).

Variants: full | noshade (lambertian-for-all, no metal/dielectric VPU work)
| nogather (skip the winner-gather matmul) | s128/s256 (truncated sphere
table — wrong image, plane-size scaling only).
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
    tb = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    cfg = RenderConfig(width=400, height=225, samples_per_pixel=16,
                       max_depth=8, seed=0, ray_batch=0)
    objs, cams, background = jumpy_balls(cfg.aspect_ratio, seed=0)
    scene, static = B.build_scene(objs, background=background, seed=cfg.seed)
    cam = cams[0]
    n = cfg.n_rays
    seed = jnp.uint32(0)
    print(f"# device: {jax.devices()[0]}  lanes={n}  tile={tb or 'auto'}",
          flush=True)

    variants = [("full", {}), ("noshade", {"ablate": "noshade"}),
                ("nogather", {"ablate": "nogather"}),
                ("s256", {"s_pad_override": 256}),
                ("s128", {"s_pad_override": 128})]
    for name, kw in variants:
        if tb:
            kw = dict(kw, tile_override=tb)
        try:
            rad, seg = render_fused(scene, cfg, cam, 0, n, seed, **kw)
            jax.block_until_ready((rad, seg))
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                rad, seg = render_fused(scene, cfg, cam, 0, n, seed, **kw)
                jax.block_until_ready((rad, seg))
            dt = (time.time() - t0) / reps
            segs = int(seg.sum())
            print(f"{name:9s} frame_s={dt:.4f}  seg/s={segs/dt/1e6:8.1f}M"
                  f"  segs={segs}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:9s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
