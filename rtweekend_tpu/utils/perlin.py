"""Gradient Perlin noise with turbulence.

Table-driven port-in-spirit of reference src/rtw/perlin.zig:10-125: 256
random unit gradient vectors plus three permutation tables, looked up as
randomVec[permX[ix] ^ permY[iy] ^ permZ[iz]] with &255 wrap, Hermite
(u^2(3-2u)) smoothed trilinear interpolation of gradient dots, and a
7-octave absolute-value turbulence. Tables are generated once host-side
(numpy, seeded); evaluation is pure gather + arithmetic over ray
batches, fully differentiable w.r.t. the query points.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

POINT_COUNT = 256  # reference src/rtw/perlin.zig:11


def make_tables(seed: int, dtype=np.float32):
    """Host-side table generation (reference Perlin.init, perlin.zig:18-38).

    Gradients replicate Vec3.random(rng, -1, 1).normalized() — a uniform
    cube sample normalized to the sphere (vec.zig:89-101) — from a seeded
    numpy generator; permutations are Fisher-Yates shuffles.
    """
    g = np.random.default_rng(seed)
    v = g.uniform(-1.0, 1.0, size=(POINT_COUNT, 3))
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    grad = (v / np.where(n == 0, 1.0, n)).astype(dtype)
    perm_x = g.permutation(POINT_COUNT).astype(np.int32)
    perm_y = g.permutation(POINT_COUNT).astype(np.int32)
    perm_z = g.permutation(POINT_COUNT).astype(np.int32)
    return grad, perm_x, perm_y, perm_z


def noise(grad, perm_x, perm_y, perm_z, p):
    """Perlin noise at points p [..., 3] (reference perlin.zig:47-78)."""
    pf = jnp.floor(p)
    uvw = p - pf
    ijk = pf.astype(jnp.int32)

    # Hermite smoothing u*u*(3-2u) (perlin.zig:52-54).
    s = uvw * uvw * (3.0 - 2.0 * uvw)

    accum = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                ix = (ijk[..., 0] + di) & 255
                iy = (ijk[..., 1] + dj) & 255
                iz = (ijk[..., 2] + dk) & 255
                gi = perm_x[ix] ^ perm_y[iy] ^ perm_z[iz]
                c = grad[gi]  # [..., 3]
                weight = uvw - jnp.array([di, dj, dk], dtype=p.dtype)
                w = (
                    (di * s[..., 0] + (1 - di) * (1.0 - s[..., 0]))
                    * (dj * s[..., 1] + (1 - dj) * (1.0 - s[..., 1]))
                    * (dk * s[..., 2] + (1 - dk) * (1.0 - s[..., 2]))
                )
                accum = accum + w * jnp.sum(c * weight, axis=-1)
    return accum


def turb(grad, perm_x, perm_y, perm_z, p, depth: int = 7):
    """|sum of 7 octaves of weight*noise(2^k p)| (reference perlin.zig:80-91)."""
    accum = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    weight = 1.0
    q = p
    for _ in range(depth):
        accum = accum + weight * noise(grad, perm_x, perm_y, perm_z, q)
        weight *= 0.5
        q = q * 2.0
    return jnp.abs(accum)
