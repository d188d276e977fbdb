"""Shared MXU formulation of the closest-hit test.

The candidate-t computation for every (ray, primitive) pair is a dot
product between a per-ray FEATURE vector and a per-primitive COEFFICIENT
row, so the entire brute-force intersection march — the reference's
recursive closest-so-far scan (reference src/rtw/hittable.zig:231-244)
— becomes one matmul that runs on the MXU, followed by a short
elementwise epilogue and a min-reduction. This module is the single
source of truth for that formulation: ops/intersect.py (jnp path,
gradients) and ops/pallas/megakernel.py (TPU fast path) both build
their coefficient tables and epilogues here, so the two paths share
bit-level candidate-t math and parity is structural, not statistical.

Sphere quadratic (Sphere.hit / MovingSphere.hit, hittable.zig:96-116,
:165-185) with the moving center c(t) = c0 + dc*(t - time0)*inv_dt
(hittable.zig:219-221). Substituting alpha = inv_dt*dc and
beta = c0 - time0*alpha gives c(t) = beta + t*alpha, and both quadratic
coefficients become linear in the ray features:

    half_b = (o - c).d = o.d - beta.d - t (alpha.d)
    c_coef = |o - c|^2 - r^2
           = |o|^2 - 2 o.beta - 2t (o.alpha)
             + 2t (beta.alpha) + t^2 |alpha|^2 + (|beta|^2 - r^2)

Rect plane solve (XyRect.hit &c., hittable.zig:270-427) folded the same
way, with the uv normalization baked in (u = (a_hit - a0)/(a1 - a0)
becomes u = p.(wa/(a1-a0)) + (ba-a0)/(a1-a0), hittable.zig:287-289):

    t = (k - o.wn - bn) / (d.wn),  valid iff u, v in [0, 1]

The 17 ray features (NF) are shared by every coefficient row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtweekend_tpu.models.scene import Scene

# Feature vector layout. One feature extraction serves all primitives.
(
    F_DX, F_DY, F_DZ,          # ray direction
    F_TDX, F_TDY, F_TDZ,       # time * direction
    F_OD,                      # o . d
    F_OX, F_OY, F_OZ,          # ray origin
    F_TOX, F_TOY, F_TOZ,       # time * origin
    F_T,                       # time
    F_TT,                      # time^2
    F_OO,                      # |o|^2
    F_ONE,                     # 1
) = range(17)
NF = 17

_PREC = jax.lax.Precision.HIGHEST


def ray_features(o, d, time):
    """[N, NF] feature matrix for a flat ray batch (jnp path)."""
    o_d = jnp.sum(o * d, axis=-1)
    o_o = jnp.sum(o * o, axis=-1)
    t = time
    cols = [
        d[:, 0], d[:, 1], d[:, 2],
        t * d[:, 0], t * d[:, 1], t * d[:, 2],
        o_d,
        o[:, 0], o[:, 1], o[:, 2],
        t * o[:, 0], t * o[:, 1], t * o[:, 2],
        t, t * t, o_o,
        jnp.ones_like(t),
    ]
    return jnp.stack(cols, axis=-1)


def sphere_coeffs(scene: Scene):
    """Coefficient rows for all spheres: (A_hb [S, NF], A_cc [S, NF]).

    feature . A_hb[i] == half_b for sphere i; feature . A_cc[i] ==
    c_coef. Inactive (padding) spheres get all-zero rows, which yield
    disc == 0 -> guaranteed miss in quadratic_t — no separate mask."""
    sp = scene.spheres
    dt = sp.c0.dtype
    alpha = sp.dc * sp.inv_dt[:, None]
    beta = sp.c0 - sp.time0[:, None] * alpha
    s = sp.c0.shape[0]
    zeros = jnp.zeros((s,), dt)

    hb = jnp.zeros((s, NF), dt)
    hb = hb.at[:, F_DX:F_DZ + 1].set(-beta)
    hb = hb.at[:, F_TDX:F_TDZ + 1].set(-alpha)
    hb = hb.at[:, F_OD].set(jnp.ones((s,), dt))

    cc = jnp.zeros((s, NF), dt)
    cc = cc.at[:, F_OX:F_OZ + 1].set(-2.0 * beta)
    cc = cc.at[:, F_TOX:F_TOZ + 1].set(-2.0 * alpha)
    cc = cc.at[:, F_T].set(2.0 * jnp.sum(beta * alpha, axis=-1))
    cc = cc.at[:, F_TT].set(jnp.sum(alpha * alpha, axis=-1))
    cc = cc.at[:, F_OO].set(jnp.ones((s,), dt))
    cc = cc.at[:, F_ONE].set(
        jnp.sum(beta * beta, axis=-1) - sp.radius * sp.radius
    )
    act = sp.active[:, None]
    return jnp.where(act, hb, zeros[:, None]), jnp.where(act, cc, zeros[:, None])


def rect_coeffs(scene: Scene):
    """Coefficient rows for all rects: six [R, NF] blocks
    (kn, dn, ua, da, vb, db) such that for feature f:

        t = (f.kn) / (f.dn)          (plane solve, k - o.wn - bn folded)
        u = f.ua + t * (f.da)        (in [0,1] iff inside a-bounds)
        v = f.vb + t * (f.db)

    Inactive rects get all-zero rows -> dn == 0 -> miss."""
    rc = scene.rects
    dt = rc.wn.dtype
    r = rc.k.shape[0]
    zeros = jnp.zeros((r,), dt)
    # padding rects have degenerate bounds (a0 > a1 or a0 == a1); guard
    # the reciprocal so no NaN enters the (masked-to-zero) rows
    da_span = rc.a1 - rc.a0
    db_span = rc.b1 - rc.b0
    inv_da = 1.0 / jnp.where(da_span == 0.0, 1.0, da_span)
    inv_db = 1.0 / jnp.where(db_span == 0.0, 1.0, db_span)

    def rows(w3, const):
        m = jnp.zeros((r, NF), dt)
        m = m.at[:, F_OX:F_OZ + 1].set(w3)
        m = m.at[:, F_ONE].set(const)
        return m

    def drows(w3):
        m = jnp.zeros((r, NF), dt)
        m = m.at[:, F_DX:F_DZ + 1].set(w3)
        return m

    kn = rows(-rc.wn, rc.k - rc.bn)
    dn = drows(rc.wn)
    ua = rows(rc.wa * inv_da[:, None], (rc.ba - rc.a0) * inv_da)
    da = drows(rc.wa * inv_da[:, None])
    vb = rows(rc.wb * inv_db[:, None], (rc.bb - rc.b0) * inv_db)
    db = drows(rc.wb * inv_db[:, None])
    act = rc.active[:, None]
    z = zeros[:, None]
    return tuple(
        jnp.where(act, m, z) for m in (kn, dn, ua, da, vb, db)
    )


# Sentinel for "no hit" — shared with ops/intersect.py (kept here to
# avoid an import cycle; intersect re-exports it).
BIG = 1e30


def quadratic_t(hb, cc, a, inv_a, t_min, big=BIG):
    """Nearest valid sphere root from (half_b, c_coef) candidates.

    Shape-agnostic: jnp path calls with [N, S] candidates and [N, 1]
    per-ray a / inv_a; the kernel calls with [S, lanes] candidates and
    [1, lanes] rays. Semantics are the reference's nearest-root-in-range
    scan (hittable.zig:104-116): try (-hb - sqrt(disc))/a, then the far
    root, else miss."""
    disc = hb * hb - a * cc
    ok = disc > 0.0
    # grad-safe sqrt: the dead branch sees 1.0, so no inf derivative at
    # disc == 0 leaks NaN into backward passes through missed lanes
    sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
    root1 = -(hb + sq) * inv_a
    root2 = (sq - hb) * inv_a
    near_ok = root1 >= t_min
    t12 = jnp.where(near_ok, root1, root2)
    valid = ok & (t12 >= t_min)
    return jnp.where(valid, t12, big)


def rect_t(kn, dn, ua, da, vb, db, t_min, big=BIG):
    """Valid rect hit t from the six folded dot products.

    Bounds are inclusive in the normalized frame (u, v in [0, 1]),
    matching the reference's `x < x0 or x > x1 -> reject`
    (hittable.zig:283-286)."""
    dn_ok = dn != 0.0
    t = kn / jnp.where(dn_ok, dn, 1.0)
    u = ua + t * da
    v = vb + t * db
    ok = (
        dn_ok
        & (t >= t_min)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (v <= 1.0)
    )
    return jnp.where(ok, t, big)


def rect_uv_rows(scene: Scene):
    """Per-rect affine uv rows evaluated at the hit POINT (not the ray):
    u = p . ua_w + ua_c, v = p . vb_w + vb_c — the same folded
    normalization as rect_coeffs, used by both paths to reconstruct the
    winner's texture coordinates after the argmin."""
    rc = scene.rects
    da_span = rc.a1 - rc.a0
    db_span = rc.b1 - rc.b0
    inv_da = 1.0 / jnp.where(da_span == 0.0, 1.0, da_span)
    inv_db = 1.0 / jnp.where(db_span == 0.0, 1.0, db_span)
    ua_w = rc.wa * inv_da[:, None]
    ua_c = (rc.ba - rc.a0) * inv_da
    vb_w = rc.wb * inv_db[:, None]
    vb_c = (rc.bb - rc.b0) * inv_db
    return ua_w, ua_c, vb_w, vb_c
