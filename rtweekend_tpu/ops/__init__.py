from rtweekend_tpu.ops.camera import Camera, make_camera, generate_rays
from rtweekend_tpu.ops.integrator import trace_paths

__all__ = ["Camera", "make_camera", "generate_rays", "trace_paths"]
