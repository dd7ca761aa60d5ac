"""One-process perf session: tile sweep + timing ablations.

The axon tunnel pays ~10 min of client init per process, so every
measurement shares this one process. NOTE: single-client tunnel — never
run concurrently with another TPU-backend JAX process (CLAUDE.md).
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


def run(scene, cfg, cam, n, seed, label, **kw):
    try:
        t0 = time.time()
        rad, seg = render_fused(scene, cfg, cam, 0, n, seed, **kw)
        jax.block_until_ready((rad, seg))
        compile_s = time.time() - t0
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            rad, seg = render_fused(scene, cfg, cam, 0, n, seed, **kw)
            jax.block_until_ready((rad, seg))
        dt = (time.time() - t0) / reps
        segs = int(seg.sum())
        print(f"{label:22s} frame_s={dt:.4f}  seg/s={segs/dt/1e6:8.1f}M"
              f"  segs={segs}  (compile {compile_s:.1f}s)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label:22s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def main() -> int:
    t0 = time.time()
    cfg = RenderConfig(width=400, height=225, samples_per_pixel=16,
                       max_depth=8, seed=0, ray_batch=0)
    objs, cams, background = jumpy_balls(cfg.aspect_ratio, seed=0)
    scene, static = B.build_scene(objs, background=background, seed=cfg.seed)
    cam = cams[0]
    n = cfg.n_rays
    seed = jnp.uint32(0)
    print(f"# device: {jax.devices()[0]}  lanes={n}  "
          f"init+build {time.time() - t0:.0f}s", flush=True)

    # -- tile sweep (full kernel) -------------------------------------------
    best, best_dt = 2048, None
    for tb in (1024, 2048, 4096, 8192):
        dt = run(scene, cfg, cam, n, seed, f"tile={tb}", tile_override=tb)
        if dt is not None and (best_dt is None or dt < best_dt):
            best, best_dt = tb, dt
    print(f"# best tile: {best}", flush=True)

    # -- ablations at the best tile ------------------------------------------
    for name, kw in (("noshade", {"ablate": "noshade"}),
                     ("nogather", {"ablate": "nogather"}),
                     ("s256 (trunc table)", {"s_pad_override": 256}),
                     ("s128 (trunc table)", {"s_pad_override": 128}),
                     ("depth1", None)):
        if name == "depth1":
            cfg1 = RenderConfig(width=400, height=225, samples_per_pixel=16,
                                max_depth=1, seed=0, ray_batch=0)
            run(scene, cfg1, cam, n, seed, f"{name} t{best}",
                tile_override=best)
        else:
            run(scene, cfg, cam, n, seed, f"{name} t{best}",
                tile_override=best, **kw)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
