"""Brute-force closest-hit intersection over the SoA scene.

Replaces the reference's recursive closest-so-far linear scan
(reference src/rtw/hittable.zig:231-244 and the per-variant hit methods)
with one batched computation: candidate t for every (ray, primitive)
pair, masked to +BIG when invalid, then an argmin over primitives.
Identical semantics (t_min = 0.001 epsilon, nearest root selection) with
no data-dependent control flow — XLA sees only matmuls, elementwise VPU
work, and a min-reduction.

The candidate-t math lives in ops/coeffs.py as a feature-vector ×
coefficient-row dot product shared verbatim with the Pallas megakernel
(ops/pallas/megakernel.py): one [N, NF] @ [NF, P] matmul per primitive
family plus the shared `quadratic_t` / `rect_t` epilogues. The two
paths therefore run the same formulas on the same coefficient tables —
parity between them is structural, not statistical.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rtweekend_tpu.models.scene import Scene
from rtweekend_tpu.ops import coeffs
from rtweekend_tpu.ops.coeffs import BIG
from rtweekend_tpu.utils import vecmath

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
    (hittable.zig:96-116, :165-185) via the shared coefficient rows
    (ops/coeffs.py): half_b and c_coef are feature-vector dot products.
    """
    feats = coeffs.ray_features(o, d, time)          # [N, NF]
    a_hb, a_cc = coeffs.sphere_coeffs(scene)         # [S, NF] each
    hb = _mm(feats, a_hb.T)                          # [N, S]
    cc = _mm(feats, a_cc.T)
    a = vecmath.norm_squared(d)[:, None]             # [N, 1]
    inv_a = 1.0 / a
    return coeffs.quadratic_t(hb, cc, a, inv_a, t_min)


def rect_candidate_ts(scene: Scene, o, d, time, t_min):
    """Candidate hit t for every (ray, rect): [N, R].

    Solves t = (k - o_n) / d_n in each rect's object frame
    (hittable.zig:279, :332, :385) with the instance transform baked into
    affine projection rows, via the shared folded coefficients
    (ops/coeffs.py rect_coeffs / rect_t). Bounds are inclusive, matching
    `x < x0 or x > x1 -> reject`.
    """
    feats = coeffs.ray_features(o, d, time)
    kn, dn, ua, da, vb, db = (
        _mm(feats, m.T) for m in coeffs.rect_coeffs(scene)
    )
    return coeffs.rect_t(kn, dn, ua, da, vb, db, t_min)


def intersect(scene: Scene, o, d, time, t_min: float = T_MIN) -> Hit:
    """Closest hit across all primitives for a ray batch.

    o, d: [N, 3]; time: [N]. Returns a Hit SoA (reference HitRecord,
    src/rtw/hit_record.zig:7-21, with the material pointer replaced by an
    integer id).
    """
    sp, rc = scene.spheres, scene.rects

    ts = sphere_candidate_ts(scene, o, d, time, t_min)   # [N, S]
    tr = rect_candidate_ts(scene, o, d, time, t_min)     # [N, R]
    t_all = jnp.concatenate([ts, tr], axis=1)

    idx = jnp.argmin(t_all, axis=1)                      # [N]
    t_best = jnp.min(t_all, axis=1)
    hit = t_best < BIG * 0.5
    return resolve_hit(scene, o, d, time, idx, hit, t_best)


def intersect_winner(scene: Scene, o, d, time, winner, t_min: float = T_MIN) -> Hit:
    """Hit record for a KNOWN winning primitive per ray — the replay
    path of the detached-sampling estimator (ops/pallas/vjp.py).

    `winner` [N] int32 is the global primitive index chosen by the full
    closest-hit march (the Pallas megakernel's per-bounce argmin), or -1
    for a miss. The discrete decision is taken as given (stop-gradient
    semantics, exactly the estimator grad.py documents); only the
    winning primitive's hit t is recomputed — differentiably — so the
    cost is O(N) gathers instead of the O(N x P) candidate march. Same
    quadratic / plane-solve formulas as ops/coeffs.py, evaluated
    directly on the gathered primitive (hittable.zig:96-116, :279)."""
    sp, rc = scene.spheres, scene.rects
    n_s = sp.radius.shape[0]
    kernel_hit = winner >= 0
    idx = jnp.where(kernel_hit, winner, 0)
    is_sphere = idx < n_s
    si = jnp.where(is_sphere, idx, 0)
    ri = jnp.where(is_sphere, 0, idx - n_s)

    # Sphere: nearest quadratic root of the gathered sphere at the ray's
    # shutter time (same roots as the coefficient form, reassociated).
    s_t = (time - sp.time0[si]) * sp.inv_dt[si]
    center = sp.c0[si] + s_t[:, None] * sp.dc[si]
    oc = o - center
    a = vecmath.norm_squared(d)
    half_b = vecmath.dot(oc, d)
    c = vecmath.norm_squared(oc) - sp.radius[si] * sp.radius[si]
    t_sph = coeffs.quadratic_t(half_b, c, a, 1.0 / a, t_min)

    # Rect: plane solve t = (k - o.wn - bn) / (d.wn); the uv bounds test
    # is part of the discrete decision already made by the march.
    dn = vecmath.dot(d, rc.wn[ri])
    dn_ok = dn != 0.0
    t_rect = (rc.k[ri] - vecmath.dot(o, rc.wn[ri]) - rc.bn[ri]) / jnp.where(
        dn_ok, dn, 1.0
    )
    t_rect = jnp.where(dn_ok & (t_rect >= t_min), t_rect, BIG)

    t_best = jnp.where(is_sphere, t_sph, t_rect)
    t_best = jnp.where(kernel_hit, t_best, BIG)
    # Re-derive the hit flag so a boundary disagreement (march said hit,
    # replay root says miss by one ulp) degrades to a miss instead of
    # poisoning geometry with t = BIG.
    hit = kernel_hit & (t_best < BIG * 0.5)
    return resolve_hit(scene, o, d, time, idx, hit, t_best)


def resolve_hit(scene: Scene, o, d, time, idx, hit, t_best) -> Hit:
    """Winner-attribute resolution shared by the full march and the
    replay path: geometry, front-face normal, uv, material id for the
    primitive `idx` per ray (reference Sphere.hit:118-127, rect uv
    hittable.zig:287-289)."""
    sp, rc = scene.spheres, scene.rects
    n_s = sp.radius.shape[0]
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

    # Rect winner attributes: uv from the hit POINT via the shared
    # folded affine rows (same resolve as the kernel's gather pass).
    ua_w, ua_c, vb_w, vb_c = coeffs.rect_uv_rows(scene)
    u_rect = vecmath.dot(p, ua_w[ri]) + ua_c[ri]
    v_rect = vecmath.dot(p, vb_w[ri]) + vb_c[ri]
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
