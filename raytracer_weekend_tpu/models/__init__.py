from raytracer_weekend_tpu.models.scenes import SCENES, generate_scene

__all__ = ["SCENES", "generate_scene"]
