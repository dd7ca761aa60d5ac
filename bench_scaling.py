"""Scaling benchmark: partitioning + collective overhead, honestly labeled.

BASELINE.md target: >=90% rays/s scaling efficiency from 1 host to >=2
hosts. Real multi-host hardware does not exist on this image (one TPU chip
behind a tunnel), so nothing here is *the* multi-host number; what CAN be
measured honestly on a 2-core host is:

  1. fixed-TOTAL-work strong scaling over 1/2/4/8 virtual CPU devices,
     per mesh axis (rays / spp / geom). Virtual devices share the same
     host cores, so the ideal is t(n) = t(1); t(1)/t(n) is a
     work-normalized efficiency in [0, 1] whose shortfall is exactly the
     partitioning + collective overhead XLA adds for that axis.
  2. a 2-process jax.distributed run (TCP collectives — the DCN analog).
     Two processes oversubscribe the 2 host cores (the workers measure
     their own CPU-time/wall ratio and report it), so the efficiency is a
     LOWER BOUND on what separate hosts would see, not an estimate of it.

On a pod the same script runs unchanged per host with the TPU backend and
then (and only then) reports a true 1->2 host efficiency.

    python bench_scaling.py              # prints one JSON line
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

_DCN_WORKER = r"""
import os, resource, sys, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%(devs)d"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
if %(nproc)d > 1:
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=%(nproc)d, process_id=pid)
sys.path.insert(0, %(repo)r)
import numpy as np
from raytracer_weekend_tpu.camera import make_camera
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.models.scenes import jumpy_balls
from raytracer_weekend_tpu.parallel.multihost import (
    global_render_mesh, render_multihost)
from raytracer_weekend_tpu.scene import builder as B

cfg = RenderConfig(width=%(w)d, height=%(h)d, samples_per_pixel=%(spp)d,
                   max_depth=%(depth)d, seed=0)
objs, cams, bg = jumpy_balls(cfg.aspect_ratio, seed=0)
scene, static = B.build_scene(objs, background=bg, seed=0)
img = render_multihost(scene, static, cfg, cams[0])      # warm/compile
cpu0 = resource.getrusage(resource.RUSAGE_SELF)
cpu0 = cpu0.ru_utime + cpu0.ru_stime
t0 = time.time()
for _ in range(%(reps)d):
    img = render_multihost(scene, static, cfg, cams[0])
wall = (time.time() - t0)
cpu1 = resource.getrusage(resource.RUSAGE_SELF)
cpu1 = cpu1.ru_utime + cpu1.ru_stime
print(f"RESULT {pid} {wall / %(reps)d} {(cpu1 - cpu0) / wall}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_dcn(nproc: int, devs_per_proc: int, w=64, h=36, spp=4, depth=4,
            reps=3):
    """Returns (t_per_rep of proc 0, mean CPU-time/wall ratio per proc)."""
    code = _DCN_WORKER % dict(devs=devs_per_proc, nproc=nproc,
                              repo=os.path.dirname(os.path.abspath(__file__)),
                              w=w, h=h, spp=spp, depth=depth, reps=reps)
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, "-c", code, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
        for i in range(nproc)]
    t0, ratios = None, []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        for line in out.decode(errors="replace").splitlines():
            if line.startswith("RESULT"):
                _, pid_s, t_s, r_s = line.split()
                ratios.append(float(r_s))
                if pid_s == "0":
                    t0 = float(t_s)
    if t0 is None:
        raise RuntimeError("no RESULT from workers")
    return t0, sum(ratios) / len(ratios)


_STRONG_WORKER = r"""
import os, sys, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
import json
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.models.scenes import jumpy_balls
from raytracer_weekend_tpu.parallel import make_render_mesh, render_sharded
from raytracer_weekend_tpu.scene import builder as B

objs, cams, bg = jumpy_balls(16 / 9, seed=0)
scene, static = B.build_scene(objs, background=bg, seed=0)
# Fixed TOTAL work for every mesh shape (identical cfg, identical ray
# population); use_pallas=False so every shape takes the same staged code
# path (n=1 would otherwise qualify for fused-interpret — different code,
# bogus ratio). Virtual devices share the host cores: ideal t(n) = t(1).
cfg = RenderConfig(width=%(w)d, height=%(h)d, samples_per_pixel=%(spp)d,
                   max_depth=%(depth)d, seed=0, use_pallas=False)
out = {}
for axis, shape_of in (("rays", lambda n: (n, 1, 1)),
                       ("spp", lambda n: (1, n, 1)),
                       ("geom", lambda n: (1, 1, n))):
    res = {}
    for n in (1, 2, 4, 8):
        rmesh = make_render_mesh(shape_of(n))
        img = render_sharded(scene, static, cfg, cams[0], rmesh)
        img.block_until_ready()
        t0 = time.time()
        for _ in range(%(reps)d):
            render_sharded(scene, static, cfg, cams[0],
                           rmesh).block_until_ready()
        res[n] = (time.time() - t0) / %(reps)d
    out[axis] = res
print("STRONG " + json.dumps(out), flush=True)
"""


def run_strong(w=64, h=36, spp=8, depth=4, reps=3) -> dict:
    """Single-process fixed-total-work scaling, per mesh axis."""
    code = _STRONG_WORKER % dict(
        repo=os.path.dirname(os.path.abspath(__file__)),
        w=w, h=h, spp=spp, depth=depth, reps=reps)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         timeout=2400, env={**os.environ,
                                            "JAX_PLATFORMS": "cpu"})
    for line in out.stdout.decode(errors="replace").splitlines():
        if line.startswith("STRONG "):
            raw = json.loads(line[7:])
            return {ax: {int(k): v for k, v in d.items()}
                    for ax, d in raw.items()}
    raise RuntimeError(
        f"no STRONG result: {out.stdout[-2000:]} {out.stderr[-2000:]}")


def main() -> int:
    times = run_strong()
    # Work-normalized efficiency in [0, 1]: same total work, shared cores,
    # ideal t(n) = t(1); jitter can push a ratio epsilon over 1 — capped.
    eff = {ax: {n: round(min(1.0, d[1] / t), 4) for n, t in d.items()}
           for ax, d in times.items()}
    worst = min(eff[ax][n] for ax in eff for n in (2, 4, 8))

    t1, r1 = run_dcn(1, 4)
    t2, r2 = run_dcn(2, 2)
    dcn_eff = round(min(1.0, t1 / t2), 4)

    print(json.dumps({
        "metric": "fixed_work_partition_efficiency",
        "value": round(worst, 4),
        "unit": "fraction",
        "vs_baseline": None,
        "note": "NOT the BASELINE 1->2-host number: no second host exists "
                "on this image. value = worst-case t(1)/t(n) over all mesh "
                "axes and n in {2,4,8} virtual CPU devices at fixed TOTAL "
                "work on shared cores (ideal 1.0; shortfall = partitioning "
                "+ collective overhead for that axis).",
        "strong_fixed_total_work": {
            "t_s": {ax: {str(n): round(t, 4) for n, t in d.items()}
                    for ax, d in times.items()},
            "efficiency_t1_over_tn": {
                ax: {str(n): eff[ax][n] for n in eff[ax]}
                for ax in eff},
        },
        "two_process_dcn_lower_bound": {
            "t_1proc_s": round(t1, 4),
            "t_2proc_s": round(t2, 4),
            "efficiency_1to2_lower_bound": dcn_eff,
            "cpu_over_wall_1proc": round(r1, 2),
            "cpu_over_wall_2proc_mean": round(r2, 2),
            "note": "2 jax.distributed processes with TCP collectives on "
                    "one 2-core host; each worker reports its CPU/wall "
                    "ratio — both processes contending for the same cores "
                    "makes this a LOWER BOUND on separate-host efficiency, "
                    "not an estimate of it.",
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
