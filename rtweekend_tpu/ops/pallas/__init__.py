from rtweekend_tpu.ops.pallas.megakernel import (
    trace_paths_pallas,
    trace_paths_pallas_compact,
)

__all__ = ["trace_paths_pallas", "trace_paths_pallas_compact"]
