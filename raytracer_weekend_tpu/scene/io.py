"""Scene serialization: SceneData + SceneStatic <-> a single .npz file.

Gives optimized scenes (train.py) and procedurally built worlds a durable
form — the checkpoint format for inverse-rendering runs and a faster cold
start than re-parsing OBJ assets.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp

from raytracer_weekend_tpu.materials import MaterialTable
from raytracer_weekend_tpu.ops.bvh import Bvh
from raytracer_weekend_tpu.scene.data import (
    Rects, SceneData, SceneStatic, Spheres, Triangles, Volumes,
)
from raytracer_weekend_tpu.textures import TextureTable

_TABLES = {
    "spheres": Spheres,
    "rects": Rects,
    "triangles": Triangles,
    "volumes": Volumes,
    "materials": MaterialTable,
    "textures": TextureTable,
}


def save_scene(path: str, scene: SceneData, static: SceneStatic) -> None:
    arrays: dict[str, np.ndarray] = {}
    for name, cls in _TABLES.items():
        table = getattr(scene, name)
        for field in cls._fields:
            arrays[f"{name}.{field}"] = np.asarray(getattr(table, field))
    arrays["background"] = np.asarray(scene.background)
    for bname in ("sphere_bvh", "triangle_bvh"):
        bvh = getattr(scene, bname)
        if bvh is not None:
            for field in Bvh._fields:
                arrays[f"{bname}.{field}"] = np.asarray(getattr(bvh, field))
    arrays["static_json"] = np.frombuffer(
        json.dumps(dataclasses.asdict(static)).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_scene(path: str) -> tuple[SceneData, SceneStatic]:
    with np.load(path) as z:
        def table(name, cls):
            return cls(*[jnp.asarray(z[f"{name}.{f}"]) for f in cls._fields])

        def bvh(name):
            key = f"{name}.bmin"
            if key not in z:
                return None
            return Bvh(*[jnp.asarray(z[f"{name}.{f}"]) for f in Bvh._fields])

        scene = SceneData(
            spheres=table("spheres", Spheres),
            rects=table("rects", Rects),
            triangles=table("triangles", Triangles),
            volumes=table("volumes", Volumes),
            materials=table("materials", MaterialTable),
            textures=table("textures", TextureTable),
            background=jnp.asarray(z["background"]),
            sphere_bvh=bvh("sphere_bvh"),
            triangle_bvh=bvh("triangle_bvh"),
        )
        static = SceneStatic(**json.loads(bytes(z["static_json"]).decode()))
    return scene, static
