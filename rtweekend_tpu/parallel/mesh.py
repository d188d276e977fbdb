"""Device-mesh construction.

The reference is single-process single-thread with no parallelism of any
kind (SURVEY.md §2, "Parallelism strategies: none"); the render loop at
reference src/main.zig:382-402 is scanline-sequential. The TPU-native
scaling axes for a path tracer are pixel TILES and SAMPLE batches — both
embarrassingly parallel, no cross-pixel communication in the bounce loop
— so the mesh is ('tiles', 'samples') with scene parameters replicated
and gradient psums riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

TILE_AXIS = "tiles"
SAMPLE_AXIS = "samples"


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh over (tiles, samples). Default: all devices on the tile axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (TILE_AXIS, SAMPLE_AXIS))
