"""Benchmark: random-spheres forward render throughput on one chip.

Workload = BASELINE.md config 1: the "One Weekend" final random-spheres
scene (jumpy_balls: ~488 spheres incl. moving + hollow glass), 400x225 film,
16 spp, max-depth 8. Prints ONE JSON line:

    {"metric": "rays_per_s_fwd", "value": N, "unit": "rays/s",
     "vs_baseline": N / 1e8, ...}

`rays_per_s_fwd` counts traced ray SEGMENTS (primary + bounce, i.e. live
lanes summed over wavefront iterations) per second — the quantity the
north-star "rays/s/chip" targets; `primary_rays_per_s` (camera rays / s) is
also reported for reference. vs_baseline is measured against the 100M
rays/s/chip north-star target (the reference publishes no numbers —
BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import argparse

    import jax
    import jax.numpy as jnp

    from raytracer_weekend_tpu import integrator
    from raytracer_weekend_tpu.config import RenderConfig
    from raytracer_weekend_tpu.models.scenes import book2_final_scene, jumpy_balls
    from raytracer_weekend_tpu.scene import builder as B

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=["random_spheres", "book2_criterion"],
                    default="random_spheres",
                    help="random_spheres = BASELINE config 1 (headline); "
                         "book2_criterion = the reference's criterion "
                         "workload, 40x22 x 100 spp "
                         "(basic_benchmark.rs:161-175)")
    args = ap.parse_args()

    # Probe the backend with a trivial round-trip; the TPU tunnel in this
    # image is single-client and can wedge — fall back to CPU (honestly
    # labeled) rather than hanging the whole bench run.
    def _backend_alive(timeout_s: float = 900.0) -> bool:
        # Cold tunnel bring-up has been measured at 10-12 MINUTES of axon
        # client init before the first dispatch (BENCH_NOTES.md); probe
        # generously or a healthy backend gets misclassified as wedged.
        # Probe in a subprocess so this process never initializes a wedged
        # backend (jax_platforms can't be re-selected after init).
        import subprocess

        code = ("import jax, jax.numpy as jnp;"
                "print(float(jnp.ones((8, 8)).sum()))")
        try:
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, timeout=timeout_s)
            return out.returncode == 0 and b"64.0" in out.stdout
        except subprocess.TimeoutExpired:
            return False

    import os
    cpu_fallback = (os.environ.get("RTW_BENCH_FORCE_CPU") == "1"
                    or not _backend_alive())
    if cpu_fallback:
        print("# TPU backend unresponsive; falling back to CPU at reduced "
              "size (liveness signal only)", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    if args.config == "random_spheres":
        spp = 2 if cpu_fallback else 16
        # ray_batch=0: the whole 1.44M-lane frame in ONE dispatch — the
        # Pallas kernels keep pairwise tiles in VMEM so no O(B*S) HBM
        # buffers exist, and the single-client tunnel pays one round-trip
        # per frame instead of one per chunk.
        batch = 1 << 17 if cpu_fallback else 0
        cfg = RenderConfig(width=400, height=225, samples_per_pixel=spp,
                           max_depth=8, seed=0, ray_batch=batch)
        objs, cams, background = jumpy_balls(cfg.aspect_ratio, seed=0)
        cfg_name = f"jumpy_balls 400x225x{spp}spp depth8"
    else:
        cfg = RenderConfig(width=40, height=22, samples_per_pixel=100,
                           max_depth=50, seed=1337, ray_batch=1 << 17)
        objs, cams, background = book2_final_scene(cfg.aspect_ratio, seed=1337)
        cfg_name = "book2_final 40x22x100spp depth50 (criterion parity)"
    scene, static = B.build_scene(objs, background=background, seed=cfg.seed)
    cam = cams[0]

    n_lanes = cfg.n_rays
    batch = cfg.ray_batch

    # Segment-counting render chunk (jitted once per shape).
    import functools

    use_fused = integrator.fused_eligible(static, cfg)
    print(f"# fused megakernel: {use_fused}", file=sys.stderr)

    @functools.partial(jax.jit, static_argnames=())
    def chunk_with_stats(scene, cam, ids, seed):
        o, d, t, ray_id = integrator._pixel_rays(cam, cfg, ids, seed)
        colors, segments = integrator.trace_rays(
            scene, static, cfg, o, d, t, ray_id, seed, return_stats=True)
        return colors.sum(), segments

    def fused_with_stats(scene, cam, start, size, seed):
        from raytracer_weekend_tpu.ops.pallas import render_fused
        colors, seg = render_fused(scene, cfg, cam, start, size, seed,
                                   static=static)
        return colors.sum(), seg.sum()

    seed = jnp.uint32(cfg.seed)
    batch = batch or n_lanes
    starts = list(range(0, n_lanes, batch))
    all_ids = [jnp.arange(s, min(s + batch, n_lanes), dtype=jnp.int32)
               for s in starts]
    # Pad the last chunk to the common shape so one compilation serves all.
    if all_ids[-1].shape[0] != batch:
        pad = batch - all_ids[-1].shape[0]
        all_ids[-1] = jnp.concatenate(
            [all_ids[-1], jnp.full((pad,), n_lanes - 1, jnp.int32)])

    def frame_outs():
        if use_fused:
            return [fused_with_stats(scene, cam, s, min(batch, n_lanes - s),
                                     seed) for s in starts]
        return [chunk_with_stats(scene, cam, ids, seed) for ids in all_ids]

    # Warmup/compile.
    t0 = time.time()
    out0 = frame_outs()[0]
    jax.block_until_ready(out0)
    print(f"# compile+first chunk: {time.time() - t0:.1f}s", file=sys.stderr)

    def run_once():
        # Queue every chunk before syncing: one host round-trip per frame.
        outs = frame_outs()
        jax.block_until_ready(outs)
        return sum(int(segs) for _, segs in outs)

    # Timed repeats. Queue ALL repeats before the single sync: a per-frame
    # block_until_ready pays one tunnel round-trip (~tens of ms) inside
    # every timed frame, which measures link latency, not chip throughput.
    run_once()  # ensure all shapes compiled + caches hot
    reps = 1 if cpu_fallback else 10
    t0 = time.time()
    all_outs = [frame_outs() for _ in range(reps)]
    jax.block_until_ready(all_outs)
    dt = (time.time() - t0) / reps
    total_segments = sum(int(segs) for _, segs in all_outs[-1])

    # Forward+backward: grad of a scalar loss through the differentiable
    # render — the fused custom VJP (megakernel forward + replay backward,
    # fused_diff.py) when eligible, else the staged path's jax.grad. Counts
    # the same traced segments (identical paths/seed) per fwd+bwd second.
    interp = jax.default_backend() == "cpu"
    # The fused custom VJP (Pallas replay-backward kernel, round 4) runs
    # whole frames in one call; chunking to 2^18 was an XLA-replay-era
    # limit and costs ~2.5x in per-chunk overheads (36 ms x 5 chunks vs
    # 79 ms full-frame, v5e).
    dcap = 1 << 21 if use_fused else 1 << 18
    dbatch = min(1 << 15 if cpu_fallback else dcap, n_lanes)
    dstarts = list(range(0, n_lanes - dbatch + 1, dbatch))

    if use_fused:
        from raytracer_weekend_tpu.fused_diff import (prepare_peel,
                                                      render_fused_diff)

        # Peeled-primary pack computed once on the concrete scene (the
        # jitted step only sees tracers, where the prepass can't run) and
        # passed through as arrays: the fwd inside fwd+bwd runs the same
        # fast path as the forward bench (VERDICT r4 #3).
        ppack = prepare_peel(scene, static, cfg, cam, dbatch)
        pstat, pnames, parrs = ppack if ppack else ((), (), ())

        @jax.jit
        def diff_chunk(scene, cam, start, seed, parrs):
            def loss(scene):
                return render_fused_diff(scene, static, cfg, cam, start,
                                         dbatch, seed, interpret=interp,
                                         peel=(pstat, pnames,
                                               tuple(parrs))).sum()
            return jax.grad(loss, allow_int=True)(scene)
        diff_chunk = functools.partial(diff_chunk, parrs=tuple(parrs))
    else:
        @jax.jit
        def diff_chunk(scene, cam, start, seed):
            def loss(scene):
                ids = start + jnp.arange(dbatch, dtype=jnp.int32)
                o, d, t, ray_id = integrator._pixel_rays(cam, cfg, ids, seed)
                return integrator.trace_rays(scene, static, cfg, o, d, t,
                                             ray_id, seed).sum()
            return jax.grad(loss, allow_int=True)(scene)

    g0 = diff_chunk(scene, cam, jnp.int32(0), seed)
    jax.block_until_ready(g0)
    reps_d = 1 if cpu_fallback else 3
    t0 = time.time()
    gs = [diff_chunk(scene, cam, jnp.int32(s), seed)
          for _ in range(reps_d) for s in dstarts]
    jax.block_until_ready(gs)
    dt_d = (time.time() - t0) / reps_d
    # Same frame, same seed => same paths; scale segments to covered lanes.
    seg_d = total_segments * (len(dstarts) * dbatch) / n_lanes
    rays_per_s_fwdbwd = seg_d / dt_d

    primary = n_lanes
    rays_per_s = total_segments / dt
    result = {
        "metric": "rays_per_s_fwd",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / 1e8, 4),
        "primary_rays_per_s": round(primary / dt, 1),
        "segments_per_frame": total_segments,
        "frame_s": round(dt, 4),
        "rays_per_s_fwdbwd": round(rays_per_s_fwdbwd, 1),
        "fwdbwd_fused": bool(use_fused),
        "config": cfg_name,
        "device": str(dev) + (" (fallback)" if cpu_fallback else ""),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
