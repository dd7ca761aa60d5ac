from raytracer_weekend_tpu.parallel.mesh import make_render_mesh, RenderMesh
from raytracer_weekend_tpu.parallel.shard import (
    render_image_sharded,
    render_sharded,
    train_step,
)

__all__ = [
    "RenderMesh",
    "make_render_mesh",
    "render_sharded",
    "render_image_sharded",
    "train_step",
]
