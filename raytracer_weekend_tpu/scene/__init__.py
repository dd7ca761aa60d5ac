from raytracer_weekend_tpu.scene.data import (
    Rects,
    SceneData,
    SceneStatic,
    Spheres,
    Triangles,
    Volumes,
)
from raytracer_weekend_tpu.scene.builder import (
    Checker,
    ConstantMedium,
    Cuboid,
    Dielectric,
    DiffuseLight,
    ImageTexture,
    Isotropic,
    Lambertian,
    Metal,
    MovingSphere,
    NoiseTexture,
    SceneBuilder,
    SolidColor,
    Sphere,
    Triangle,
    UVDebug,
    XYRectangle,
    XZRectangle,
    YZRectangle,
    build_scene,
)

__all__ = [
    "SceneData", "SceneStatic", "Spheres", "Rects", "Triangles", "Volumes",
    "SceneBuilder", "build_scene",
    "Sphere", "MovingSphere", "XYRectangle", "XZRectangle", "YZRectangle",
    "Cuboid", "Triangle", "ConstantMedium",
    "Lambertian", "Metal", "Dielectric", "DiffuseLight", "Isotropic",
    "SolidColor", "Checker", "NoiseTexture", "ImageTexture", "UVDebug",
]
