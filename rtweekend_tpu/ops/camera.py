"""Thin-lens camera with motion-blur shutter.

Vectorized re-design of the reference Camera (reference src/main.zig:40-101):
init computes the identical viewport basis; getRay becomes a batched ray
generator over (pixel, sample) grids with counter-based jitter/lens/time
sampling instead of the serial RNG draws at main.zig:390-392 and :91-100.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from rtweekend_tpu.utils import rng as rng_mod


@dataclasses.dataclass
class Camera:
    origin: jax.Array        # [3]
    horizontal: jax.Array    # [3]
    vertical: jax.Array      # [3]
    lower_left: jax.Array    # [3]
    u: jax.Array             # [3]
    v: jax.Array             # [3]
    w: jax.Array             # [3]
    lens_radius: jax.Array   # []
    time0: jax.Array         # []
    time1: jax.Array         # []


jax.tree_util.register_dataclass(
    Camera,
    data_fields=[f.name for f in dataclasses.fields(Camera)],
    meta_fields=[],
)


def make_camera(
    look_from,
    look_at,
    vup,
    vfov_deg: float,
    aspect_ratio: float,
    aperture: float,
    focus_dist: float,
    time0: float = 0.0,
    time1: float = 1.0,
    dtype=jnp.float32,
) -> Camera:
    """Camera.init (reference src/main.zig:52-89), formula for formula.

    Host-side numpy throughout: camera init is one-time setup, and on
    the remote-TPU runtime every eager jnp op costs a ~0.4 s compile
    round trip (a dozen of them made scene setup slower than the
    render). The math matches the vecmath formulas op for op."""
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    look_from = np.asarray(look_from, np_dtype)
    look_at = np.asarray(look_at, np_dtype)
    vup = np.asarray(vup, np_dtype)

    theta = math.radians(vfov_deg)
    h = math.tan(theta / 2.0)
    viewport_height = 2.0 * h
    viewport_width = aspect_ratio * viewport_height

    def _normalized(x):
        # vecmath.normalized's zero-guard (reference vec.zig:33-40),
        # with its exact op sequence (x * (1/sqrt(ns))) so the host
        # numpy result is bit-identical to the former eager-jnp camera
        ns = np_dtype.type(x[0] * x[0] + x[1] * x[1] + x[2] * x[2])
        if ns == 0.0:
            return x
        return (x * (np_dtype.type(1.0) / np.sqrt(ns))).astype(np_dtype)

    w = _normalized(look_from - look_at)
    u = _normalized(np.cross(vup, w).astype(np_dtype))
    v = np.cross(w, u).astype(np_dtype)

    origin = look_from
    horizontal = (u * np_dtype.type(viewport_width * focus_dist)).astype(np_dtype)
    vertical = (v * np_dtype.type(viewport_height * focus_dist)).astype(np_dtype)
    lower_left = (
        origin - horizontal / np_dtype.type(2.0) - vertical / np_dtype.type(2.0)
        - w * np_dtype.type(focus_dist)
    ).astype(np_dtype)

    return Camera(
        origin=jnp.asarray(origin),
        horizontal=jnp.asarray(horizontal),
        vertical=jnp.asarray(vertical),
        lower_left=jnp.asarray(lower_left),
        u=jnp.asarray(u),
        v=jnp.asarray(v),
        w=jnp.asarray(w),
        lens_radius=jnp.asarray(np_dtype.type(aperture / 2.0)),
        time0=jnp.asarray(np_dtype.type(time0)),
        time1=jnp.asarray(np_dtype.type(time1)),
    )


def generate_rays(camera: Camera, width: int, height: int, pixel_ids, sample_ids, seed):
    """Batched Camera.getRay (reference src/main.zig:91-100) plus the
    per-sample pixel jitter of the render loop (main.zig:390-391).

    pixel_ids: int32 [N] linear ids j*width + i with j counted from the
    BOTTOM of the image (the reference's v axis; the framebuffer flip
    happens at accumulation, cf. main.zig:396).
    sample_ids: int32 [N] sample index within the pixel.
    seed: uint32 scalar.

    Returns (origins [N,3], dirs [N,3], times [N]). Randomness is a pure
    function of (seed, pixel_id, sample_id), so any batching/sharding of
    the same pixel grid yields identical rays.
    """
    dtype = camera.origin.dtype
    i = (pixel_ids % width).astype(dtype)
    j = (pixel_ids // width).astype(dtype)

    u0 = rng_mod.uniform4(seed, pixel_ids, sample_ids, rng_mod.STREAM_CAMERA0, dtype)
    u1 = rng_mod.uniform4(seed, pixel_ids, sample_ids, rng_mod.STREAM_CAMERA1, dtype)

    s = (i + u0[:, 0]) / (width - 1.0)
    t = (j + u0[:, 1]) / (height - 1.0)

    rd = rng_mod.in_unit_disk_from_u(u0[:, 2], u0[:, 3]) * camera.lens_radius
    offset = camera.u[None, :] * rd[:, :1] + camera.v[None, :] * rd[:, 1:2]

    origins = camera.origin[None, :] + offset
    dirs = (
        camera.lower_left[None, :]
        + s[:, None] * camera.horizontal[None, :]
        + t[:, None] * camera.vertical[None, :]
        - camera.origin[None, :]
        - offset
    )
    times = camera.time0 + u1[:, 0] * (camera.time1 - camera.time0)
    return origins, dirs, times
