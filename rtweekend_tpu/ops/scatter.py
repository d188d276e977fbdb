"""Branchless material scatter.

Replaces the reference Material tagged-union dispatch
(reference src/rtw/material.zig:22-38) with compute-all-then-select over
the four material families — each branch is a handful of VPU FLOPs, so
computing all of them beats divergent control flow on TPU. Returns the
scattered direction, attenuation, emission, and an alive mask.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rtweekend_tpu.models.scene import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE,
    MAT_LIGHT,
    MAT_METAL,
    Scene,
)
from rtweekend_tpu.ops.intersect import Hit
from rtweekend_tpu.ops.textures import texture_value
from rtweekend_tpu.utils import rng as rng_mod
from rtweekend_tpu.utils import vecmath


@dataclasses.dataclass
class Scatter:
    direction: jax.Array    # [N, 3] next-bounce direction
    attenuation: jax.Array  # [N, 3]
    emitted: jax.Array      # [N, 3]
    alive: jax.Array        # [N] bool — False = absorbed / emissive end


jax.tree_util.register_dataclass(
    Scatter,
    data_fields=[f.name for f in dataclasses.fields(Scatter)],
    meta_fields=[],
)


def scatter(scene: Scene, seed, pixel_ids, sample_ids, bounce_idx, d_in, hit: Hit) -> Scatter:
    """One scatter event per ray.

    Randomness is counter-based: pure function of
    (seed, pixel_id, sample_id, bounce_idx) — see utils/rng.py.
    """
    mats = scene.materials
    mtype = mats.mtype[hit.mat_id]          # [N]
    tex_id = mats.tex_id[hit.mat_id]
    fuzz = mats.fuzz[hit.mat_id]
    ior = mats.ior[hit.mat_id]
    dtype = d_in.dtype

    stream_a = rng_mod.BOUNCE_STREAM0 + 2 * bounce_idx
    stream_b = stream_a + 1
    u_b = rng_mod.uniform4(seed, pixel_ids, sample_ids, stream_b, dtype)
    # The diffuse unit vector and the metal fuzz point share stream A's
    # gaussians — the branches are mutually exclusive per ray.
    unit_vec = rng_mod.unit_vector(seed, pixel_ids, sample_ids, stream_a, dtype)
    sphere_pt = unit_vec * jnp.cbrt(u_b[:, 0])[:, None]  # in-unit-sphere
    u_choice = u_b[:, 1]                                 # Schlick Bernoulli

    # Shared: albedo/emission texture at the hit (also serves the metal's
    # solid albedo and the light's emission, both stored as textures).
    tex_val = texture_value(scene, tex_id, hit.u, hit.v, hit.p)

    # --- diffuse (material.zig:41-53): normal + random unit vector,
    # degenerate -> normal.
    diff_dir = hit.normal + unit_vec
    diff_dir = jnp.where(
        vecmath.near_zero(diff_dir)[:, None], hit.normal, diff_dir
    )

    # --- metal (material.zig:55-66): mirror reflect of the normalized
    # incoming dir, fuzzed; absorbed when reflected falls below surface.
    unit_in = vecmath.normalized(d_in)
    reflected = vecmath.reflect(unit_in, hit.normal)
    metal_dir = reflected + fuzz[:, None] * sphere_pt
    metal_alive = vecmath.dot(reflected, hit.normal) > 0.0

    # --- dielectric (material.zig:68-92): Snell with Schlick-probability
    # reflection; always scatters, attenuation == 1.
    ratio = jnp.where(hit.front_face, 1.0 / ior, ior)
    cos_theta = jnp.minimum(vecmath.dot(-unit_in, hit.normal), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 1e-20))
    can_refract = ratio * sin_theta <= 1.0
    r0 = (1.0 - ratio) / (1.0 + ratio)
    r0 = r0 * r0
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5  # material.zig:87-91
    do_refract = can_refract & (reflectance < u_choice)
    refr_dir = vecmath.refract(unit_in, hit.normal, ratio)
    diel_dir = jnp.where(do_refract[:, None], refr_dir, reflected)

    # --- select by material type -------------------------------------------
    is_metal = mtype == MAT_METAL
    is_diel = mtype == MAT_DIELECTRIC
    is_light = mtype == MAT_LIGHT

    direction = jnp.where(is_metal[:, None], metal_dir, diff_dir)
    direction = jnp.where(is_diel[:, None], diel_dir, direction)

    one = jnp.ones_like(tex_val)
    attenuation = jnp.where(is_diel[:, None], one, tex_val)

    # Only DiffuseLight emits (material.zig:31-38); the integrator adds
    # emitted before the scatter test, so lights terminate with emission.
    emitted = jnp.where(is_light[:, None], tex_val, jnp.zeros_like(tex_val))

    alive = jnp.where(is_metal, metal_alive, jnp.ones_like(is_metal))
    alive = alive & ~is_light

    return Scatter(
        direction=direction, attenuation=attenuation, emitted=emitted, alive=alive
    )
