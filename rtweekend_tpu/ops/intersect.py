"""Brute-force closest-hit intersection over the SoA scene.

Replaces the reference's recursive closest-so-far linear scan
(reference src/rtw/hittable.zig:231-244 and the per-variant hit methods)
with one batched computation: candidate t for every (ray, primitive)
pair, masked to +BIG when invalid, then an argmin over primitives.
Identical semantics (t_min = 0.001 epsilon, nearest root selection) with
no data-dependent control flow — XLA sees only matmuls, elementwise VPU
work, and a min-reduction.

TPU-first formulation: all per-(ray, primitive) dot products are
expressed as [N,3] @ [3,M] matmuls against precomputed per-primitive
row vectors (sphere centers / rect affine rows), so no [N, M, 3]
temporary is ever materialized.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rtweekend_tpu.models.scene import Scene
from rtweekend_tpu.utils import vecmath

# Sentinel for "no hit". Finite (not inf) so masked lanes never breed
# NaNs in downstream arithmetic; far beyond any real scene t.
BIG = 1e30
T_MIN = 1e-3  # reference src/main.zig:109

_PREC = jax.lax.Precision.HIGHEST


@dataclasses.dataclass
class Hit:
    t: jax.Array           # [N] (BIG where no hit)
    hit: jax.Array         # [N] bool
    p: jax.Array           # [N, 3]
    normal: jax.Array      # [N, 3] front-face-flipped unit-by-construction
    front_face: jax.Array  # [N] bool
    u: jax.Array           # [N]
    v: jax.Array           # [N]
    mat_id: jax.Array      # [N] int32


jax.tree_util.register_dataclass(
    Hit, data_fields=[f.name for f in dataclasses.fields(Hit)], meta_fields=[]
)


def _mm(a, b):
    return jnp.dot(a, b, precision=_PREC)


def sphere_candidate_ts(scene: Scene, o, d, time, t_min):
    """Candidate hit t for every (ray, sphere): [N, S].

    The quadratic of reference Sphere.hit / MovingSphere.hit
    (hittable.zig:96-116, :165-185) with the moving center
    c(t) = c0 + dc*(t - time0)*inv_dt (hittable.zig:219-221), rearranged
    so every ray-sphere coupling term is a matmul:
        oc.d   = o.d - (c0.d + s * dc.d)
        |oc|^2 = |o|^2 - 2(o.c0 + s * o.dc) + |c0|^2 + 2 s c0.dc + s^2 |dc|^2
    """
    sp = scene.spheres
    s_t = (time[:, None] - sp.time0[None, :]) * sp.inv_dt[None, :]  # [N, S]

    d_c0 = _mm(d, sp.c0.T)      # [N, S]
    d_dc = _mm(d, sp.dc.T)
    o_c0 = _mm(o, sp.c0.T)
    o_dc = _mm(o, sp.dc.T)

    o_d = vecmath.dot(o, d)[:, None]        # [N, 1]
    a = vecmath.norm_squared(d)[:, None]    # [N, 1]
    o_o = vecmath.norm_squared(o)[:, None]

    c0_c0 = vecmath.norm_squared(sp.c0)[None, :]   # [1, S]
    c0_dc = vecmath.dot(sp.c0, sp.dc)[None, :]
    dc_dc = vecmath.norm_squared(sp.dc)[None, :]
    r2 = (sp.radius * sp.radius)[None, :]

    half_b = o_d - (d_c0 + s_t * d_dc)
    c_c = c0_c0 + 2.0 * s_t * c0_dc + s_t * s_t * dc_dc
    c_coef = o_o - 2.0 * (o_c0 + s_t * o_dc) + c_c - r2

    disc = half_b * half_b - a * c_coef
    ok = disc > 0.0
    sqrtd = jnp.sqrt(jnp.where(ok, disc, 1.0))  # grad-safe sqrt
    inv_a = 1.0 / a
    root1 = (-half_b - sqrtd) * inv_a
    root2 = (-half_b + sqrtd) * inv_a
    # Nearest root in range, trying the near root first
    # (hittable.zig:109-116); t_max is implicit in the final argmin.
    r1_ok = ok & (root1 >= t_min)
    r2_ok = ok & (root2 >= t_min)
    t = jnp.where(r1_ok, root1, jnp.where(r2_ok, root2, BIG))
    return jnp.where(sp.active[None, :], t, BIG)


def rect_candidate_ts(scene: Scene, o, d, t_min):
    """Candidate hit t for every (ray, rect): [N, R].

    Solves t = (k - o_n) / d_n in each rect's object frame
    (hittable.zig:279, :332, :385) with the instance transform baked into
    affine projection rows (see models/scene.py). Bounds are inclusive,
    matching `x < x0 or x > x1 -> reject`.
    """
    rc = scene.rects
    on = _mm(o, rc.wn.T) + rc.bn[None, :]   # [N, R]
    dn = _mm(d, rc.wn.T)
    oa = _mm(o, rc.wa.T) + rc.ba[None, :]
    da = _mm(d, rc.wa.T)
    ob = _mm(o, rc.wb.T) + rc.bb[None, :]
    db = _mm(d, rc.wb.T)

    dn_ok = dn != 0.0
    t = (rc.k[None, :] - on) / jnp.where(dn_ok, dn, 1.0)
    a_hit = oa + t * da
    b_hit = ob + t * db
    ok = (
        dn_ok
        & (t >= t_min)
        & (a_hit >= rc.a0[None, :])
        & (a_hit <= rc.a1[None, :])
        & (b_hit >= rc.b0[None, :])
        & (b_hit <= rc.b1[None, :])
        & rc.active[None, :]
    )
    return jnp.where(ok, t, BIG)


def intersect(scene: Scene, o, d, time, t_min: float = T_MIN) -> Hit:
    """Closest hit across all primitives for a ray batch.

    o, d: [N, 3]; time: [N]. Returns a Hit SoA (reference HitRecord,
    src/rtw/hit_record.zig:7-21, with the material pointer replaced by an
    integer id).
    """
    sp, rc = scene.spheres, scene.rects
    n_s = sp.radius.shape[0]

    ts = sphere_candidate_ts(scene, o, d, time, t_min)   # [N, S]
    tr = rect_candidate_ts(scene, o, d, t_min)           # [N, R]
    t_all = jnp.concatenate([ts, tr], axis=1)

    idx = jnp.argmin(t_all, axis=1)                      # [N]
    t_best = jnp.min(t_all, axis=1)
    hit = t_best < BIG * 0.5
    t_eff = jnp.where(hit, t_best, 1.0)                  # keep geometry finite

    p = o + t_eff[:, None] * d

    is_sphere = idx < n_s
    si = jnp.where(is_sphere, idx, 0)
    ri = jnp.where(is_sphere, 0, idx - n_s)

    # Sphere winner attributes (hittable.zig:118-127).
    s_t = (time - sp.time0[si]) * sp.inv_dt[si]
    center_w = sp.c0[si] + s_t[:, None] * sp.dc[si]
    outward_sph = (p - center_w) / sp.radius[si][:, None]
    # getSphereUv (hittable.zig:145-150). The reference never sets uv for
    # MovingSphere (SURVEY.md quirk 2.7b); we set it uniformly — benign.
    # acos input is clamped 1e-7 inside [-1, 1] and atan2 is guarded at
    # the poles: both have infinite gradients at the boundary, which
    # would NaN-poison backward passes through lanes that exactly hit a
    # pole (e.g. the top of a ground sphere). Forward change < 1e-3 in
    # theta only within 1e-7 of the pole.
    at_pole = (jnp.abs(outward_sph[:, 2]) + jnp.abs(outward_sph[:, 0])) < 1e-12
    phi = (
        jnp.arctan2(
            -jnp.where(at_pole, 0.0, outward_sph[:, 2]),
            jnp.where(at_pole, 1.0, outward_sph[:, 0]),
        )
        + jnp.pi
    )
    theta = jnp.arccos(jnp.clip(-outward_sph[:, 1], -1.0 + 1e-7, 1.0 - 1e-7))
    u_sph = phi / (2.0 * jnp.pi)
    v_sph = theta / jnp.pi

    # Rect winner attributes.
    wa_g, ba_g = rc.wa[ri], rc.ba[ri]
    wb_g, bb_g = rc.wb[ri], rc.bb[ri]
    a_obj = vecmath.dot(o, wa_g) + ba_g + t_eff * vecmath.dot(d, wa_g)
    b_obj = vecmath.dot(o, wb_g) + bb_g + t_eff * vecmath.dot(d, wb_g)
    u_rect = (a_obj - rc.a0[ri]) / (rc.a1[ri] - rc.a0[ri])
    v_rect = (b_obj - rc.b0[ri]) / (rc.b1[ri] - rc.b0[ri])
    outward_rect = rc.normal[ri]

    outward = jnp.where(is_sphere[:, None], outward_sph, outward_rect)
    front_face = vecmath.dot(outward, d) < 0.0
    normal = jnp.where(front_face[:, None], outward, -outward)

    u = jnp.where(is_sphere, u_sph, u_rect)
    v = jnp.where(is_sphere, v_sph, v_rect)
    mat_id = jnp.where(is_sphere, sp.mat_id[si], rc.mat_id[ri])
    mat_id = jnp.where(hit, mat_id, 0)

    return Hit(
        t=t_best,
        hit=hit,
        p=p,
        normal=normal,
        front_face=front_face,
        u=u,
        v=v,
        mat_id=mat_id,
    )
