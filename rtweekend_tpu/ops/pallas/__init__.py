from rtweekend_tpu.ops.pallas.megakernel import (
    supports_scene,
    trace_paths_pallas,
)

__all__ = ["supports_scene", "trace_paths_pallas"]
