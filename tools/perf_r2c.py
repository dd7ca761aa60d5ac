"""TPU session 5 (round 2): on-chip verification of the round-2 work.

One process, everything batched (the axon tunnel pays ~10 min init once):
  1. Mesh scenes COMPILE + parity on the real chip (VERDICT item 1):
     cow (5.8k tris) and suspension (17.2k tris, cap raised to 24576)
     fused renders compared against CPU staged-path references
     (tools/ref_r2c.py — run it first).
  2. Deferred-texture scenes parity on-chip (VERDICT item 3): earth,
     two_perlin_spheres, simple_light, book2.
  3. Timing: cow/suspension/book2 fused seg/s at the headline config,
     book2 criterion config, jumpy_balls fwd (regression check).
  4. fwd+bwd seg/s via the replay custom-VJP (VERDICT item 2).

Results append to /tmp/r2c_results.txt; run under nohup/background.
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

REF = "/tmp/r2c_ref"
PARITY = [
    ("wavefront_cow_obj", 96, 54, 2, 6),
    ("wavefront_suspension_obj", 96, 54, 2, 6),
    ("book2_final_scene", 40, 22, 4, 6),
    ("earth", 64, 36, 4, 6),
    ("two_perlin_spheres", 64, 36, 4, 6),
    ("simple_light", 64, 36, 4, 6),
]
TIMING = [  # (scene, w, h, spp, depth, reps)
    ("wavefront_cow_obj", 400, 225, 16, 8, 5),
    ("wavefront_suspension_obj", 400, 225, 16, 8, 3),
    ("book2_final_scene", 400, 225, 16, 8, 3),
    ("jumpy_balls", 400, 225, 16, 8, 10),
]


def setup(name, w, h, spp, depth, seed=7):
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                       max_depth=depth, seed=seed, ray_batch=0)
    objs, cams, bg = SCENES[name](cfg.aspect_ratio)
    scene, static = B.build_scene(objs, background=bg, seed=seed)
    return scene, static, cfg, cams[0]


def main() -> int:
    t0 = time.time()
    print(f"# device: {jax.devices()[0]}", flush=True)
    print(f"# init {time.time()-t0:.0f}s", flush=True)

    # --- parity -----------------------------------------------------------
    for name, w, h, spp, depth in PARITY:
        try:
            scene, static, cfg, cam = setup(name, w, h, spp, depth)
            seed = jnp.uint32(7)
            t1 = time.time()
            rad, _ = render_fused(scene, cfg, cam, 0, cfg.n_rays, seed,
                                  static=static)
            rad = np.asarray(rad)
            ref = np.load(f"{REF}/{name}.npy")
            diff = np.abs(rad - ref)
            denom = np.abs(ref) + 1e-3
            rel = diff / denom
            print(f"parity {name:28s} max={diff.max():.2e} "
                  f"mean={diff.mean():.2e} p99.9rel={np.quantile(rel, 0.999):.2e} "
                  f"frac(rel>1e-2)={float((rel > 1e-2).mean()):.4f} "
                  f"({time.time()-t1:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"parity {name:28s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # --- timing -----------------------------------------------------------
    for name, w, h, spp, depth, reps in TIMING:
        try:
            scene, static, cfg, cam = setup(name, w, h, spp, depth, seed=0)
            seed = jnp.uint32(0)
            n = cfg.n_rays
            t1 = time.time()
            rad, seg = render_fused(scene, cfg, cam, 0, n, seed,
                                    static=static)
            jax.block_until_ready((rad, seg))
            compile_s = time.time() - t1
            segs = int(seg.sum())
            t1 = time.time()
            outs = [render_fused(scene, cfg, cam, 0, n, seed, static=static)
                    for _ in range(reps)]
            jax.block_until_ready(outs)
            dt = (time.time() - t1) / reps
            print(f"time   {name:28s} frame_s={dt:.4f} "
                  f"seg/s={segs/dt/1e6:8.1f}M segs={segs} "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"time   {name:28s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # --- criterion config (depth 50, deferred textures + volumes) ---------
    try:
        scene, static, cfg, cam = setup("book2_final_scene", 40, 22, 100, 50,
                                        seed=1337)
        seed = jnp.uint32(1337)
        n = cfg.n_rays
        t1 = time.time()
        rad, seg = render_fused(scene, cfg, cam, 0, n, seed, static=static)
        jax.block_until_ready((rad, seg))
        compile_s = time.time() - t1
        segs = int(seg.sum())
        t1 = time.time()
        outs = [render_fused(scene, cfg, cam, 0, n, seed, static=static)
                for _ in range(5)]
        jax.block_until_ready(outs)
        dt = (time.time() - t1) / 5
        print(f"time   book2_criterion 40x22x100 d50 frame_s={dt:.4f} "
              f"seg/s={segs/dt/1e6:8.1f}M segs={segs} "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"time   book2_criterion FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    # --- fwd+bwd (replay custom VJP) --------------------------------------
    try:
        from raytracer_weekend_tpu.fused_diff import render_fused_diff

        scene, static, cfg, cam = setup("jumpy_balls", 400, 225, 16, 8,
                                        seed=0)
        seed = jnp.uint32(0)
        n = cfg.n_rays
        dbatch = 1 << 18
        dstarts = list(range(0, n - dbatch + 1, dbatch))

        @jax.jit
        def diff_chunk(scene, cam, start, seed):
            def loss(scene):
                return render_fused_diff(scene, static, cfg, cam, start,
                                         dbatch, seed).sum()
            return jax.grad(loss, allow_int=True)(scene)

        t1 = time.time()
        g0 = diff_chunk(scene, cam, jnp.int32(0), seed)
        jax.block_until_ready(g0)
        compile_s = time.time() - t1
        # segment count for the covered lanes (same paths as fwd timing)
        _, seg = render_fused(scene, cfg, cam, 0, n, seed, static=static)
        segs = int(np.asarray(seg)[: len(dstarts) * dbatch].sum())
        reps = 3
        t1 = time.time()
        gs = [diff_chunk(scene, cam, jnp.int32(s), seed)
              for _ in range(reps) for s in dstarts]
        jax.block_until_ready(gs)
        dt = (time.time() - t1) / reps
        print(f"time   jumpy fwd+bwd                frame_s={dt:.4f} "
              f"seg/s={segs/dt/1e6:8.1f}M segs={segs} "
              f"(compile {compile_s:.0f}s)", flush=True)
        # sanity: a representative grad leaf is finite and nonzero
        gleaf = np.asarray(g0.textures.color1)
        print(f"       grad color1 |max|={np.abs(gleaf).max():.3e} "
              f"finite={bool(np.isfinite(gleaf).all())}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"time   fwd+bwd FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    print(f"# total session {time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
