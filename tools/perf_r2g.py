"""TPU session 8: verify the sublane-stacked table fix + fwd/bwd breakdown.

1. Mesh compiles after the relayout (tools/perf_r2e.py bisect showed any
   planar table with >= ~15k lanes crashes the compile helper): cow,
   suspension, book2, monument at the headline config + parity refs.
2. fwd+bwd slowdown breakdown (jumpy, 262144-lane chunk):
     a. fused fwd              (baseline)
     b. fused fwd emit_paths   (+code planes)
     c. replay fwd             (XLA re-trace, no grad)
     d. grad wrt camera only   (no scatter into tables)
     e. grad wrt full scene    (gather transposes -> scatter-adds)
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
]
TIMING = [
    ("wavefront_cow_obj", 400, 225, 16, 8, 5),
    ("wavefront_suspension_obj", 400, 225, 16, 8, 3),
    ("book2_final_scene", 400, 225, 16, 8, 3),
    ("textured_monument", 400, 225, 16, 8, 3),
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
            rel = diff / (np.abs(ref) + 1e-3)
            print(f"parity {name:28s} max={diff.max():.2e} "
                  f"mean={diff.mean():.2e} frac(rel>1e-2)="
                  f"{float((rel > 1e-2).mean()):.4f} ({time.time()-t1:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"parity {name:28s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

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
                  f"{str(e)[:160]}", flush=True)

    # ---- criterion config (depth 50, deferred textures + volumes) ---------
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
        print(f"time   book2_criterion 40x22x100d50 frame_s={dt:.4f} "
              f"seg/s={segs/dt/1e6:8.1f}M segs={segs} "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"time   book2_criterion FAILED: {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)

    # ---- fwd+bwd breakdown on jumpy ---------------------------------------
    from raytracer_weekend_tpu import integrator
    from raytracer_weekend_tpu.fused_diff import render_fused_diff

    scene, static, cfg, cam = setup("jumpy_balls", 400, 225, 16, 8, seed=0)
    seed = jnp.uint32(0)
    nb = 1 << 18
    reps = 5

    def bench(fn, label, *args):
        try:
            t1 = time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            comp = time.time() - t1
            t1 = time.time()
            outs = [fn(*args) for _ in range(reps)]
            jax.block_until_ready(outs)
            dt = (time.time() - t1) / reps
            print(f"bwd-brk {label:26s} chunk_s={dt:.4f} (compile {comp:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bwd-brk {label:26s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    bench(lambda: render_fused(scene, cfg, cam, 0, nb, seed, static=static),
          "a fused fwd")
    bench(lambda: render_fused(scene, cfg, cam, 0, nb, seed, static=static,
                               emit_paths=True), "b fused fwd+codes")

    _, _, codes = render_fused(scene, cfg, cam, 0, nb, seed, static=static,
                               emit_paths=True)
    ids = jnp.arange(nb, dtype=jnp.int32)

    @jax.jit
    def replay_only(scene, cam, codes):
        o, d, t, rid = integrator._pixel_rays(cam, cfg, ids, seed)
        return integrator.replay_rays(scene, static, cfg, o, d, t, rid,
                                      seed, codes)
    bench(replay_only, "c replay fwd", scene, cam, codes)

    @jax.jit
    def grad_cam(scene, cam):
        def loss(cam):
            return render_fused_diff(scene, static, cfg, cam, 0, nb,
                                     seed).sum()
        return jax.grad(loss)(cam)
    bench(grad_cam, "d grad wrt camera", scene, cam)

    @jax.jit
    def grad_scene(scene, cam):
        def loss(scene):
            return render_fused_diff(scene, static, cfg, cam, 0, nb,
                                     seed).sum()
        return jax.grad(loss, allow_int=True)(scene)
    bench(grad_scene, "e grad wrt scene", scene, cam)

    print(f"# total session {time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
