from rtweekend_tpu.utils import image, perlin, rng, vecmath

__all__ = ["image", "perlin", "rng", "vecmath"]
