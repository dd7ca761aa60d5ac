"""raytracer_weekend_tpu — a TPU-native differentiable wavefront path tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Rust
"Ray Tracing in One Weekend" engine (reference: AndreasKarg/raytracer-weekend,
surveyed in SURVEY.md). Instead of recursive, trait-object scalar code, rays
are traced as SoA megabatches through an iterative wavefront loop
(`lax.scan` over bounce depth), primitives live in structure-of-array tables,
materials/textures are table-driven and branchless, RNG is counter-based
(sharding-invariant), and the whole render is pure and differentiable.

Layering (mirrors SURVEY.md §1, rebuilt TPU-first):

  utils.cli                      — console front-end (ref: console_app/src/main.rs)
  models.scenes                  — 13-scene catalog    (ref: console_app/src/scenes.rs)
  integrator                     — wavefront render driver (ref: raytracer_weekend_lib/src/lib.rs)
  ops.{sphere,rect,triangle,...} — batched hit kernels (ref: src/hittable/*)
  ops.bvh / bvh_builder          — linearized BVH      (ref: src/bvh.rs)
  materials / textures / perlin  — shading tables      (ref: src/material.rs, texture.rs, perlin.rs)
  camera / vecmath / rng         — math base           (ref: src/camera.rs, vec3.rs)
  scene.builder / scene.objloader— scene DSL + assets  (ref: scenes.rs, hittable/triangular.rs)
  parallel.{mesh,shard,stream}   — device mesh, sharded render, pixel-stream protocol
"""

__version__ = "0.1.0"

from raytracer_weekend_tpu.camera import Camera, make_camera
from raytracer_weekend_tpu.config import RenderConfig

__all__ = [
    "Camera",
    "make_camera",
    "RenderConfig",
]
