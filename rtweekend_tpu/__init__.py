"""rtweekend_tpu — a TPU-native differentiable path tracer built on JAX/Pallas.

Re-implements, TPU-first, the full capability set of the reference Zig ray
tracer (nsfisis/RayTracingInOneWeekend.zig): thin-lens camera with motion
blur, spheres / moving spheres / axis-aligned rects with baked
translate/rotate-Y instancing, lambertian / metal / dielectric / emissive
materials, solid / checker / Perlin-noise / image textures, six procedural
scenes plus the book-cover final scene, and PNG/PPM output — as a
batched wavefront integrator over SoA scene arrays instead of the
reference's recursive pointer-chasing design (reference src/main.zig:103-122).
"""

from rtweekend_tpu.config import RenderConfig
from rtweekend_tpu.models.scene import Scene, SceneBuilder
from rtweekend_tpu.ops.camera import Camera, make_camera
from rtweekend_tpu.render import render, render_image

__all__ = [
    "RenderConfig",
    "Scene",
    "SceneBuilder",
    "Camera",
    "make_camera",
    "render",
    "render_image",
]
