"""Batched 3-vector math over trailing-axis-3 arrays.

TPU-native replacement for the reference's scalar Vec3 struct
(reference src/rtw/vec.zig:8-109): every op is defined over arrays of
shape [..., 3] so the whole wavefront of rays is processed per call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEAR_ZERO_EPS = 1e-8  # reference src/rtw/vec.zig:99


def dot(u, v):
    """u·v over the trailing axis (reference src/rtw/vec.zig:21-23)."""
    return jnp.sum(u * v, axis=-1)


def norm_squared(v):
    return jnp.sum(v * v, axis=-1)


def norm(v):
    return jnp.sqrt(norm_squared(v))


def cross(u, v):
    """Cross product (reference src/rtw/vec.zig:25-31)."""
    return jnp.cross(u, v)


def normalized(v):
    """Unit vector, returning v unchanged when ||v|| == 0.

    The zero-guard replicates reference src/rtw/vec.zig:33-40 and doubles
    as NaN-safety: under jnp all lanes execute, so dead lanes holding a
    zero vector must not produce inf/NaN. The guard is applied to the
    rsqrt INPUT (not just the output select) so the backward pass is
    NaN-free too: d sqrt/dx at 0 is inf, and 0 * inf = NaN would leak
    through jnp.where into live lanes' gradients.
    """
    ns = norm_squared(v)[..., None]
    zero = ns == 0.0
    inv = jax.lax.rsqrt(jnp.where(zero, 1.0, ns))
    return jnp.where(zero, v, v * inv)


def near_zero(v):
    """True where every component is < 1e-8 in magnitude
    (reference src/rtw/vec.zig:98-101)."""
    return jnp.all(jnp.abs(v) < NEAR_ZERO_EPS, axis=-1)


def reflect(v, n):
    """v reflected about normal n (reference src/rtw/material.zig:112-114)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv, n, etai_over_etat):
    """Snell refraction of unit vector uv about n
    (reference src/rtw/material.zig:116-121).

    etai_over_etat has shape broadcastable to uv[..., 0]. The sqrt
    argument is clamped away from 0 (forward change <= 1e-6 in
    magnitude) because the branchless scatter evaluates this for EVERY
    lane — including total-internal-reflection lanes where
    1 - |perp|^2 < 0 and lanes at grazing incidence where it is 0, whose
    infinite sqrt-gradient would NaN-poison the psum'd parameter grads.
    """
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    r_out_perp = etai_over_etat[..., None] * (uv + cos_theta[..., None] * n)
    par_sq = jnp.maximum(jnp.abs(1.0 - norm_squared(r_out_perp)), 1e-12)
    r_out_parallel = -jnp.sqrt(par_sq)[..., None] * n
    return r_out_perp + r_out_parallel
