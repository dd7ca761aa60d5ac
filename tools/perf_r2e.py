"""TPU session 7: bisect the planar-size compile threshold.

Cow (r_pad 6144) fails at every (depth, grid, r_chunk); book2 (r_pad 2560)
passes. Synthesize K-triangle / K-rect scenes to pin the threshold shape
and the family (tri vs rect vs mixed).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.ops.pallas import render_fused
from raytracer_weekend_tpu.scene import builder as B


def tri_scene(k, rng):
    objs = []
    for _ in range(k):
        c = rng.uniform(-5, 5, 3)
        v = c + rng.uniform(-0.4, 0.4, (3, 3))
        objs.append(B.Triangle.flat_shaded(
            (tuple(v[0]), tuple(v[1]), tuple(v[2])),
            B.Lambertian((0.5, 0.5, 0.5))))
    return objs


def rect_scene(k, rng):
    objs = []
    for _ in range(k):
        x0, y0 = rng.uniform(-5, 5, 2)
        kz = rng.uniform(-5, 5)
        objs.append(B.XYRectangle(x0, x0 + 0.5, y0, y0 + 0.5, kz,
                                  B.Lambertian((0.5, 0.5, 0.5))))
    return objs


def trial(objs, label, depth=6, **kw):
    cfg = RenderConfig(width=40, height=22, samples_per_pixel=4,
                       max_depth=depth, seed=7, ray_batch=0)
    scene, static = B.build_scene(objs, background=(0.7, 0.8, 1.0), seed=7)
    try:
        t0 = time.time()
        rad, seg = render_fused(scene, cfg, cams(), 0, cfg.n_rays,
                                jnp.uint32(7), static=static, **kw)
        jax.block_until_ready((rad, seg))
        print(f"PASS {label:44s} ({time.time()-t0:5.1f}s) "
              f"mean={float(rad.mean()):.4f}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {label:44s} {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return False


_CAM = None


def cams():
    global _CAM
    if _CAM is None:
        from raytracer_weekend_tpu.models.scenes import _cam
        _CAM = _cam((13, 2, 3), (0, 2.5, 0), 40.0, 16 / 9)
    return _CAM


def main() -> int:
    t0 = time.time()
    rng = np.random.default_rng(0)
    print(f"# device: {jax.devices()[0]}", flush=True)

    for k in (2048, 2432, 2560, 2816, 3072, 4096, 5804):
        trial(tri_scene(k, rng), f"tris k={k} rc512 d6",
              r_chunk_override=512)
    # family probe: rects at a size where tris (presumably) fail
    trial(rect_scene(4096, rng), "rects k=4096 rc512 d6",
          r_chunk_override=512)

    print(f"# total {time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
