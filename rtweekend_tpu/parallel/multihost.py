"""Multi-host runtime.

Single-host multi-chip is handled entirely by parallel/shard.py (one
process sees all local devices). Across hosts, JAX's runtime makes the
same code work: every process runs the same program over the global
mesh, psums ride ICI within a slice and DCN across hosts, and each host
only materializes its addressable shard of the framebuffer. The
reference has no distributed anything (SURVEY.md §2); this is the
TPU-native scale-out path.

Exercised for real by tests/test_multiprocess.py: two OS processes,
a localhost coordinator, jax.distributed.initialize, shard_map over the
global mesh with cross-process psum, and process_allgather — the same
calls a TPU pod makes, on the CPU backend's cross-process collectives.
Kept deliberately thin: initialize(), a global-mesh builder, and a
framebuffer gather.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from rtweekend_tpu.parallel.mesh import SAMPLE_AXIS, TILE_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize passthrough (env-driven on TPU pods:
    all arguments are auto-detected on Cloud TPU)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_mesh(samples_axis: int = 1) -> Mesh:
    """('tiles', 'samples') mesh over ALL processes' devices. Pixel
    tiles shard across the fastest-varying device dimension so each
    host's tile shards are host-local (gather stays on DCN only at the
    end)."""
    devices = np.asarray(jax.devices())
    n = devices.size
    if n % samples_axis:
        raise ValueError(f"{n} devices not divisible by samples={samples_axis}")
    return Mesh(
        devices.reshape(n // samples_axis, samples_axis),
        (TILE_AXIS, SAMPLE_AXIS),
    )


def gather_framebuffer(fb) -> np.ndarray:
    """Fetch the fully-replicated or sharded framebuffer to the host.

    With out_specs P(tiles) the array is jax.Array-sharded across
    processes; multihost_utils.process_allgather assembles the global
    value on every host.
    """
    try:
        from jax.experimental import multihost_utils

        if jax.process_count() > 1:
            return np.asarray(
                multihost_utils.process_allgather(fb, tiled=True)
            )
    except ImportError:  # pragma: no cover
        pass
    return np.asarray(fb)
