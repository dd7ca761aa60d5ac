"""Inverse rendering: optimize scene parameters against target images.

The differentiable counterpart the reference cannot express (SURVEY.md §2:
the rebuild adds differentiability as a first-class capability). Wraps the
sharded render in an optax loop: any float leaf of SceneData — texture
colors, image texels, metal fuzz, dielectric IOR, sphere geometry, triangle
vertices — can be optimized; integer/type tables are frozen automatically.

    from raytracer_weekend_tpu.train import InverseRenderer
    ir = InverseRenderer(static, cfg, cam, target_image, rmesh)
    scene, history = ir.fit(scene, steps=100)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raytracer_weekend_tpu.camera import Camera
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.parallel.mesh import RenderMesh
from raytracer_weekend_tpu.parallel.shard import render_sharded
from raytracer_weekend_tpu.integrator import render_image
from raytracer_weekend_tpu.scene.data import SceneData, SceneStatic


def _float_mask(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating), tree)


@dataclasses.dataclass
class InverseRenderer:
    """L2 inverse rendering with Adam over differentiable scene leaves."""

    static: SceneStatic
    cfg: RenderConfig
    cam: Camera
    target: jnp.ndarray                  # (H, W, 3) mean radiance
    rmesh: Optional[RenderMesh] = None   # None: single-device render
    learning_rate: float = 1e-2
    loss_fn: Optional[Callable] = None   # (img, target) -> scalar; default L2

    def _render(self, scene):
        if self.rmesh is not None:
            sums = render_sharded(scene, self.static, self.cfg, self.cam,
                                  self.rmesh)
        else:
            from raytracer_weekend_tpu.integrator import render_chunk
            ids = jnp.arange(self.cfg.n_rays, dtype=jnp.int32)
            colors = render_chunk(scene, self.static, self.cfg, self.cam,
                                  ids, jnp.uint32(self.cfg.seed))
            spp = self.cfg.samples_per_pixel
            sums = colors.reshape(self.cfg.n_pixels, spp, 3).sum(1).reshape(
                self.cfg.height, self.cfg.width, 3)
        return sums / self.cfg.samples_per_pixel

    def loss(self, scene):
        img = self._render(scene)
        if self.loss_fn is not None:
            return self.loss_fn(img, self.target)
        return jnp.mean((img - self.target) ** 2)

    def fit(self, scene: SceneData, steps: int = 100,
            callback: Optional[Callable] = None):
        """Run `steps` of Adam. Returns (optimized_scene, loss_history)."""
        labels = jax.tree_util.tree_map(
            lambda m: "adam" if m else "freeze", _float_mask(scene))
        opt = optax.multi_transform(
            {"adam": optax.adam(self.learning_rate),
             "freeze": optax.set_to_zero()},
            labels)
        opt_state = opt.init(scene)

        @jax.jit
        def step(scene, opt_state):
            loss, grads = jax.value_and_grad(self.loss, allow_int=True)(scene)
            # Integer leaves come back as float0 cotangents; give the frozen
            # branch same-dtype zeros instead.
            grads = jax.tree_util.tree_map(
                lambda p, g: jnp.zeros_like(p)
                if g.dtype == jax.dtypes.float0 else g,
                scene, grads)
            updates, opt_state = opt.update(grads, opt_state)
            scene = optax.apply_updates(scene, updates)
            return scene, opt_state, loss

        history = []
        for i in range(steps):
            scene, opt_state, loss = step(scene, opt_state)
            history.append(float(loss))
            if callback is not None:
                callback(i, float(loss), scene)
        return scene, history
