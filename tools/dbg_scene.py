"""Round-3 debug scenes: isolate moving-sphere vs lens-aperture effects."""
import sys
sys.path.insert(0, "/root/repo")
from raytracer_weekend_tpu.config import RenderConfig
from raytracer_weekend_tpu.camera import make_camera
from raytracer_weekend_tpu.scene import builder as B


def build(kind):
    objs = [B.Sphere((0, -1000, 0), 1000.0, B.Lambertian((0.5, 0.5, 0.5)))]
    import numpy as np
    rng = np.random.default_rng(3)
    for i in range(200):
        c = (rng.uniform(-8, 8), 0.2, rng.uniform(-8, 8))
        if kind == "moving":
            c1 = (c[0], c[1] + rng.uniform(0, 0.5), c[2])
            objs.append(B.MovingSphere(c, 0.0, c1, 1.0, 0.2,
                                       B.Lambertian((0.5, 0.3, 0.3))))
        else:
            objs.append(B.Sphere(c, 0.2, B.Lambertian((0.5, 0.3, 0.3))))
    aperture = 0.1 if kind == "lens" else 0.0
    cam = make_camera((13, 2, 3), (0, 0, 0), (0, 1, 0), 20.0, 16 / 9,
                      aperture, 10.0, 0.0, 1.0)
    scene, static = B.build_scene(objs, background=(0.7, 0.8, 1.0), seed=0)
    cfg = RenderConfig(width=64, height=36, samples_per_pixel=16,
                       max_depth=1, seed=0, use_pallas=False)
    return scene, static, cfg, cam


def build_jumpy_variant(kind):
    """Strip-down variants of the real jumpy_balls scene (depth-1 config)."""
    from raytracer_weekend_tpu.models.scenes import jumpy_balls
    objs, cams, bg = jumpy_balls(16 / 9, seed=0)

    def is_moving(o):
        return type(o).__name__ == "MovingSphere"

    def is_dielectric(o):
        return type(getattr(o, "material", None)).__name__ == "Dielectric"

    if kind == "nomove":
        objs = [B.Sphere(o.center0, o.radius, o.material)
                if is_moving(o) else o for o in objs]
    elif kind == "noglass":
        objs = [o for o in objs if not is_dielectric(o)]
    elif kind == "half":
        objs = objs[:240]
    scene, static = B.build_scene(objs, background=bg, seed=0)
    cfg = RenderConfig(width=64, height=36, samples_per_pixel=16,
                       max_depth=1, seed=0, use_pallas=False)
    return scene, static, cfg, cams[0]
