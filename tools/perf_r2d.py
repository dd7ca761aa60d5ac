"""TPU session 6: compile-failure binary search for planar mega-kernel.

Observed: cornell (1 planar chunk) PASSES at any grid/depth; book2
(5 chunks, defer_tex) passes at d6/grid4, fails at d8/grid1407; cow
(6-24 chunks) fails everywhere. Isolate which knob (depth, grid size,
chunk count, defer_tex) crosses the remote compiler.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.models.scenes import SCENES
from raytracer_weekend_tpu.ops.pallas import render_fused
from raytracer_weekend_tpu.scene import builder as B

CACHE = {}


def trial(name, w, h, spp, depth, label, **kw):
    key = name
    if key not in CACHE:
        objs, cams, bg = SCENES[name](16.0 / 9.0)
        CACHE[key] = (objs, cams, bg)
    objs, cams, bg = CACHE[key]
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                       max_depth=depth, seed=7, ray_batch=0)
    scene, static = B.build_scene(objs, background=bg, seed=7)
    try:
        t0 = time.time()
        rad, seg = render_fused(scene, cfg, cams[0], 0, cfg.n_rays,
                                jnp.uint32(7), static=static, **kw)
        jax.block_until_ready((rad, seg))
        print(f"PASS {label:44s} ({time.time()-t0:5.1f}s) "
              f"mean={float(rad.mean()):.4f}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {label:44s} {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return False


def main() -> int:
    t0 = time.time()
    print(f"# device: {jax.devices()[0]}", flush=True)

    # depth axis (book2, tiny grid, 5 chunks, defer_tex on)
    trial("book2_final_scene", 40, 22, 4, 6, "book2 40x22x4 d6 (pass ref)")
    trial("book2_final_scene", 40, 22, 4, 7, "book2 40x22x4 d7")
    trial("book2_final_scene", 40, 22, 4, 8, "book2 40x22x4 d8")
    # grid axis (book2, d6)
    trial("book2_final_scene", 200, 112, 4, 6, "book2 200x112x4 d6 grid~88")
    trial("book2_final_scene", 400, 225, 16, 6, "book2 400x225x16 d6 grid1407")
    # defer_tex off (compile-only probe; radiance wrong for noise/image)
    trial("book2_final_scene", 40, 22, 4, 8, "book2 40x22x4 d8 nodefer",
          defer_tex=False)
    # chunk-count axis (cow, tiny grid, d6): rc 2048 -> 3 chunks,
    # 1024 -> 6, 512 -> 12
    trial("wavefront_cow_obj", 40, 22, 4, 6, "cow 40x22x4 d6 rc2048 (3ch)",
          r_chunk_override=2048)
    trial("wavefront_cow_obj", 40, 22, 4, 6, "cow 40x22x4 d6 rc1024 (6ch)",
          r_chunk_override=1024)
    trial("wavefront_cow_obj", 40, 22, 4, 6, "cow 40x22x4 d6 rc512 (12ch)",
          r_chunk_override=512)
    # depth axis on cow at the passing chunk count (if any)
    trial("wavefront_cow_obj", 40, 22, 4, 1, "cow 40x22x4 d1 rc512",
          r_chunk_override=512)
    trial("wavefront_cow_obj", 40, 22, 4, 2, "cow 40x22x4 d2 rc512",
          r_chunk_override=512)
    # single-chunk cow: rc = r_pad0 (5888 -> one big chunk) — VMEM test
    trial("wavefront_cow_obj", 40, 22, 4, 6, "cow 40x22x4 d6 rc5888 (1ch)",
          r_chunk_override=5888)

    print(f"# total {time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
