from rtweekend_tpu.models.scene import (
    Scene,
    SceneBuilder,
    Spheres,
    Rects,
    Materials,
    Textures,
)
from rtweekend_tpu.models import builders

__all__ = [
    "Scene",
    "SceneBuilder",
    "Spheres",
    "Rects",
    "Materials",
    "Textures",
    "builders",
]
