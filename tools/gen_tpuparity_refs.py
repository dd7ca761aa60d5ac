"""Generate CPU staged-path reference images for the on-chip parity gate.

Writes /tmp/tpuparity_refs/{scene}.npy — per-pixel color SUMS at the gate
config (64x36, 16 spp, depth 8, seed 0) rendered with the exact-f32 CPU
staged path. tools/perf_r3.E7_parity_gate compares the TPU fused renders
against these with Monte-Carlo-aware tolerances (per-lane bit parity is not
meaningful across backends: ~1-ulp rounding differences send a few percent
of lanes onto different — equally valid — sample paths).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from raytracer_weekend_tpu import integrator  # noqa: E402
from raytracer_weekend_tpu.config import RenderConfig  # noqa: E402
from raytracer_weekend_tpu.models.scenes import SCENES  # noqa: E402
from raytracer_weekend_tpu.scene import builder as B  # noqa: E402

OUT = os.environ.get("RTW_REF_DIR", "/tmp/tpuparity_refs")
os.makedirs(OUT, exist_ok=True)

cfg = RenderConfig(width=int(os.environ.get("RTW_REF_W", 64)),
                   height=int(os.environ.get("RTW_REF_H", 36)),
                   samples_per_pixel=16, max_depth=8,
                   seed=0, use_pallas=False)
for name in SCENES:
    path = os.path.join(OUT, f"{name}.npy")
    if os.path.exists(path):
        print(f"{name}: exists", flush=True)
        continue
    t0 = time.time()
    objs, cams, bg = SCENES[name](cfg.aspect_ratio)
    scene, static = B.build_scene(objs, background=bg, seed=cfg.seed)
    img = np.asarray(integrator.render_image(scene, static, cfg, cams[0]))
    np.save(path, img)
    print(f"{name}: {time.time()-t0:.0f}s", flush=True)
print("done", flush=True)
