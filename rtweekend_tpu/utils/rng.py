"""Counter-based stateless sampling.

The reference draws from ONE serial Xoshiro256++ stream threaded through
scene-gen, pixel jitter, lens sampling, and per-bounce rejection loops
(reference src/main.zig:300-301, src/rtw/rand.zig:8-40). A parallel
tracer cannot reproduce that draw order, so every sample here is a pure
function of (seed, pixel_id, sample_id, stream): a PCG4D integer hash
(Jarzynski & Olano, JCGT 2020 — the standard GPU-rendering construction)
maps the 4-lane counter to 4 uniform draws in a handful of VPU integer
ops. Properties that matter:

- reordering rays, re-tiling, or resharding the mesh cannot change any
  sample (bitwise reproducibility across device meshes);
- no key state is carried between bounces — the bounce index is part of
  the counter, so the integrator's scan carry stays small;
- draws are integer-derived, hence automatically detached from autodiff
  (the "detached sampling" the VJP design requires, SURVEY.md §7.5).

Rejection loops are replaced by fixed-count transforms with identical
distributions:
- unit sphere interior (rand.zig:22-28) -> gaussian direction x cbrt-radius
- unit disk            (rand.zig:30-36) -> sqrt-polar
- unit vector          (rand.zig:38-40) -> normalized gaussian
"""

from __future__ import annotations

import jax.numpy as jnp

from rtweekend_tpu.utils import vecmath

# Stream ids: camera raygen uses fixed high streams; bounce b uses
# streams BOUNCE_STREAM0 + 2*b and +2*b+1.
# Plain Python ints, NOT jnp scalars: a module-level device array
# captured into a jit trace forces a device->host read of its value at
# trace time, and on the remote-TPU runtime any D2H transfer
# permanently degrades the session's dispatch fast path (measured:
# ~0.1ms -> ~65ms per op afterwards). Keep every RNG stream id host-side.
STREAM_CAMERA0 = 0xC0FFEE00
STREAM_CAMERA1 = 0xC0FFEE01
BOUNCE_STREAM0 = 0x10000


def _u32(x):
    if isinstance(x, int):  # python ints may exceed int32 (stream ids)
        return jnp.uint32(x & 0xFFFFFFFF)
    return jnp.asarray(x).astype(jnp.uint32)


def pcg4d(a, b, c, d):
    """PCG4D hash: 4 x uint32 counter -> 4 x uint32 random words."""
    x, y, z, w = _u32(a), _u32(b), _u32(c), _u32(d)
    x = x * jnp.uint32(1664525) + jnp.uint32(1013904223)
    y = y * jnp.uint32(1664525) + jnp.uint32(1013904223)
    z = z * jnp.uint32(1664525) + jnp.uint32(1013904223)
    w = w * jnp.uint32(1664525) + jnp.uint32(1013904223)
    x += y * w
    y += z * x
    z += x * y
    w += y * z
    x ^= x >> 16
    y ^= y >> 16
    z ^= z >> 16
    w ^= w >> 16
    x += y * w
    y += z * x
    z += x * y
    w += y * z
    return x, y, z, w


def _to_unit(bits, dtype):
    """uint32 -> [0, 1) float using the top 24 bits."""
    return (bits >> jnp.uint32(8)).astype(dtype) * dtype.type(2.0**-24)


def uniform4(seed, pixel_ids, sample_ids, stream, dtype=jnp.float32):
    """Four U[0,1) draws per ray: [N, 4].

    seed: uint32 scalar; pixel_ids/sample_ids: int32/uint32 [N];
    stream: scalar draw-stream id (python int or traced).
    """
    dtype = jnp.dtype(dtype)
    x, y, z, w = pcg4d(pixel_ids, sample_ids, _u32(stream), _u32(seed))
    return jnp.stack(
        [_to_unit(x, dtype), _to_unit(y, dtype), _to_unit(z, dtype), _to_unit(w, dtype)],
        axis=-1,
    )


def gauss4_from_u4(u, dtype):
    """Box-Muller: 4 uniforms -> 4 independent standard normals.

    Uses log(1-u) with 1-u in [2^-24, 1], so no -inf lanes exist.
    """
    two_pi = dtype.type(2.0 * jnp.pi)
    r0 = jnp.sqrt(-2.0 * jnp.log1p(-u[..., 0]))
    r1 = jnp.sqrt(-2.0 * jnp.log1p(-u[..., 2]))
    t0 = two_pi * u[..., 1]
    t1 = two_pi * u[..., 3]
    return jnp.stack(
        [r0 * jnp.cos(t0), r0 * jnp.sin(t0), r1 * jnp.cos(t1), r1 * jnp.sin(t1)],
        axis=-1,
    )


def unit_vector(seed, pixel_ids, sample_ids, stream, dtype=jnp.float32):
    """Uniform direction on the unit sphere; replaces the
    rejection-sampled randomUnitVector (reference src/rtw/rand.zig:38-40)."""
    dtype = jnp.dtype(dtype)
    u = uniform4(seed, pixel_ids, sample_ids, stream, dtype)
    g = gauss4_from_u4(u, dtype)
    return vecmath.normalized(g[..., :3])


def in_unit_sphere(seed, pixel_ids, sample_ids, stream, radius_u, dtype=jnp.float32):
    """Uniform point in the unit ball; replaces the rejection loop at
    reference src/rtw/rand.zig:22-28. Direction from gaussians, radius
    from cbrt of the provided uniform (volume element r^2 dr)."""
    d = unit_vector(seed, pixel_ids, sample_ids, stream, dtype)
    return d * jnp.cbrt(radius_u)[..., None]


def in_unit_disk_from_u(u1, u2):
    """Uniform point in the unit disk (z=0) from two uniforms; replaces
    the rejection loop at reference src/rtw/rand.zig:30-36."""
    r = jnp.sqrt(u1)
    theta = (2.0 * jnp.pi) * u2
    return jnp.stack(
        [r * jnp.cos(theta), r * jnp.sin(theta), jnp.zeros_like(r)], axis=-1
    )
