"""Round-4 TPU experiment library (drive via tools/tpu_server.py).

Extends tools/perf_r3.py (same process/namespace discipline: ONE warm
server, jobs dropped into /root/repo/.tpu_jobs/). Round-4 levers under
test (VERDICT r3 "Next round"):

  F1_sphere_chunk_ab()   jumpy A/B: chunked spheres + clist vs r3 baseline
  F2_combine_profile()   deferred-texture cliff: kernel vs combine split
  F3_fwdbwd_profile()    fwd / replay-fwd / fwd+bwd time breakdown
  F4_criterion_batch()   multi-frame batched criterion config
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tools.perf_r3 import run1, setup  # noqa: E402  (warm scene cache)


def F1_sphere_chunk_ab(reps=10):
    """Jumpy (random-spheres, BASELINE config 1): the round-4 headline.

    r3 honest baseline: 93.5M seg/s (BENCH_r03). Chunked spheres walk
    Morton 128-sphere chunks with per-row slab culls and a bounce-0
    frustum chunk list.
    """
    run1("jumpy_balls", "r3-baseline(nochunk)", reps=reps,
         s_chunk_override=0)
    run1("jumpy_balls", "chunked-default", reps=reps)
    run1("jumpy_balls", "chunked-nocull", reps=reps, ablate="nocull")
    run1("jumpy_balls", "chunked-noclist", reps=reps, ablate="noclist")
    run1("jumpy_balls", "chunked-notile", reps=reps, ablate="notile")
    for tb in (1024, 2048, 4096):
        run1("jumpy_balls", f"chunked-t{tb}", reps=reps, tile_override=tb)
    for sc in (256,):
        run1("jumpy_balls", f"chunk{sc}", reps=reps, s_chunk_override=sc)


def F2_combine_profile(name="two_perlin_spheres", reps=5):
    """Split scene frame time into kernel-only vs deferred combine."""
    from raytracer_weekend_tpu.ops.pallas.megakernel import render_fused

    scene, static, cfg, cam = setup(name)
    seed = jnp.uint32(0)
    n = cfg.n_rays

    # Full (kernel + combine), then kernel-only (defer_tex False would
    # change semantics; instead time the same call with combine included
    # vs a nodefer ablate that zeroes the texture work).
    run1(name, "full", reps=reps)
    # Kernel-only: emit paths but skip combine by rendering with
    # defer_tex=False is wrong for noise scenes; approximate with the
    # 'nogather' ablation (no texture decode at all) for a lower bound.
    run1(name, "nogather-lb", reps=reps, ablate="nogather")


def F3_fwdbwd_profile(name="jumpy_balls", reps=5):
    from raytracer_weekend_tpu.fused_diff import render_fused_diff
    from raytracer_weekend_tpu.ops.pallas.megakernel import render_fused
    from raytracer_weekend_tpu.integrator import _pixel_rays, replay_rays

    scene, static, cfg, cam = setup(name)
    seed = jnp.uint32(0)
    n = cfg.n_rays

    def timed(label, fn, *a, **k):
        t0 = time.time()
        out = jax.block_until_ready(fn(*a, **k))
        print(f"  {label} compile+1 {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        outs = [fn(*a, **k) for _ in range(reps)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / reps
        print(f"  {label} {1e3*dt:7.1f} ms", flush=True)
        return out, dt

    (rad, seg), t_fwd = timed(
        "fused fwd        ", lambda: render_fused(
            scene, cfg, cam, 0, n, seed, static=static))
    (out3), t_fwdp = timed(
        "fused fwd+paths  ", lambda: render_fused(
            scene, cfg, cam, 0, n, seed, static=static, emit_paths=True))
    codes = out3[2]

    ids = jnp.arange(n, dtype=jnp.int32)
    o, d, tm, rid = _pixel_rays(cam, cfg, ids, seed)
    rp = jax.jit(lambda sc, c: replay_rays(sc, static, cfg, o, d, tm, rid,
                                           seed, c))
    _, t_rp = timed("replay fwd       ", rp, scene, codes)

    def loss(sc):
        rad = render_fused_diff(sc, static, cfg, cam, 0, n, seed)
        return jnp.sum(rad * rad)

    vg = jax.jit(jax.value_and_grad(loss, allow_int=True))
    _, t_vg = timed("fwd+bwd (vjp)    ", vg, scene)
    segs = int(seg.sum())
    print(f"  segs={segs}  fwd {segs/t_fwd/1e6:.1f}M  "
          f"fwdbwd {segs/t_vg/1e6:.1f}M  ratio {t_vg/t_fwd:.2f}x",
          flush=True)


def F4_criterion_batch(frames=8, reps=3):
    """Criterion config (book2 40x22x100 d50, basic_benchmark.rs:161-175)
    batched as ONE dispatch at frames*100 spp: separate per-frame
    dispatches stay latency-bound (measured 0.85M seg/s — the 497K-lane
    frame cannot occupy the chip); widening the spp axis is the
    statistically equivalent way to give the chip work."""
    from tools.perf_r3 import run1

    run1("book2_final_scene", f"criterion-x{frames}", reps=reps,
         w=40, h=22, spp=100 * frames, depth=50)
