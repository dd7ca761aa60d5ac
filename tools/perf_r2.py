"""TPU session 3 (round-1 cont.): pipelined timing + sweep + mesh scenes.

One process shares the ~10 min axon client init (single-client tunnel —
never run concurrently with another TPU JAX process, see CLAUDE.md).

New vs perf_planar2: timing queues all reps before ONE block_until_ready.
Per-rep sync pays a tunnel round-trip inside every timed frame, which
measures link latency, not chip throughput; `syncmode` prints both so the
RTT share is quantified once.
"""

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

REPS = 10


def run(scene, static, cfg, cam, n, seed, label, per_rep_sync=False, **kw):
    try:
        t0 = time.time()
        rad, seg = render_fused(scene, cfg, cam, 0, n, seed, static=static,
                                **kw)
        jax.block_until_ready((rad, seg))
        compile_s = time.time() - t0
        segs = int(seg.sum())
        if per_rep_sync:
            t0 = time.time()
            for _ in range(REPS):
                out = render_fused(scene, cfg, cam, 0, n, seed,
                                   static=static, **kw)
                jax.block_until_ready(out)
            dt = (time.time() - t0) / REPS
        else:
            t0 = time.time()
            outs = [render_fused(scene, cfg, cam, 0, n, seed, static=static,
                                 **kw) for _ in range(REPS)]
            jax.block_until_ready(outs)
            dt = (time.time() - t0) / REPS
        print(f"{label:34s} frame_s={dt:.4f}  seg/s={segs/dt/1e6:8.1f}M"
              f"  segs={segs}  (compile {compile_s:.1f}s)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{label:34s} FAILED: {type(e).__name__}: {str(e)[:200]}",
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

    # -- RTT quantification: same build, per-rep sync vs pipelined ---------
    run(sc, st, cfg, cam, n, seed, "jumpy t2048 SYNC-PER-REP",
        tile_override=2048, per_rep_sync=True)
    run(sc, st, cfg, cam, n, seed, "jumpy t2048 pipelined",
        tile_override=2048)

    # -- jumpy tile sweep (pipelined) ---------------------------------------
    best, best_dt = 2048, None
    for tb in (1024, 4096, 8192):
        dt = run(sc, st, cfg, cam, n, seed, f"jumpy tile={tb}",
                 tile_override=tb)
        if dt is not None and (best_dt is None or dt < best_dt):
            best, best_dt = tb, dt
    print(f"# best jumpy tile: {best}", flush=True)

    # -- ablations at best tile ---------------------------------------------
    for name, kw in (("noshade", {"ablate": "noshade"}),
                     ("nogather", {"ablate": "nogather"}),
                     ("s256 trunc", {"s_pad_override": 256}),
                     ("s128 trunc", {"s_pad_override": 128})):
        run(sc, st, cfg, cam, n, seed, f"jumpy {name} t{best}",
            tile_override=best, **kw)
    cfg1 = RenderConfig(width=400, height=225, samples_per_pixel=16,
                        max_depth=1, seed=0, ray_batch=0)
    run(sc, st, cfg1, cam, n, seed, f"jumpy depth1 t{best}",
        tile_override=best)

    # -- cornell + smokey (planar + volumes) --------------------------------
    sc, st, cfg, cam, n = setup(cornell_box, 400, 400)
    for tb in (4096, 8192):
        run(sc, st, cfg, cam, n, seed, f"cornell 400x400x16 tile{tb}",
            tile_override=tb)
    sc, st, cfg, cam, n = setup(smokey_cornell_box, 400, 400)
    for tb in (2048, 4096):
        run(sc, st, cfg, cam, n, seed, f"smokey 400x400x16 tile{tb}",
            tile_override=tb)

    # -- mesh scenes (prim-axis chunking, first TPU numbers) ----------------
    sc, st, cfg, cam, n = setup(wavefront_cow_obj, 400, 225)
    for tb in (1024, 2048):
        run(sc, st, cfg, cam, n, seed, f"cow 5.8k tris tile{tb}",
            tile_override=tb)
    run(sc, st, cfg, cam, n, seed, "cow tile1024 rc1024",
        tile_override=1024, r_chunk_override=1024)
    sc, st, cfg, cam, n = setup(wavefront_suspension_obj, 400, 225)
    run(sc, st, cfg, cam, n, seed, "suspension 17k tris t1024",
        tile_override=1024)

    print(f"# total session {time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
