"""Pallas TPU bounce megakernel — MXU closest-hit edition.

The whole per-ray path loop — intersect every primitive, pick the
closest, scatter, accumulate radiance, for all `max_depth` bounces —
runs inside ONE Pallas kernel. Ray state lives in vector registers/VMEM
for the entire path; HBM traffic is one read of the camera rays and one
write of the radiance. This is the TPU-native replacement for the jnp
wavefront integrator's hot path (ops/integrator.py), which itself
replaces the reference's recursive rayColor (reference src/main.zig:103-122).

Design (see SURVEY.md §7):
- Rays ride the VPU lanes: a tile is (8, 128) = 1024 rays, one program
  per tile on the grid.
- The closest-hit march runs on the MXU. Every candidate hit quantity
  is a dot product between a 17-wide per-ray FEATURE vector and a
  static per-primitive COEFFICIENT row (ops/coeffs.py — shared verbatim
  with the jnp path, so kernel↔jnp parity is structural): per bounce
  and per sublane row of 128 rays, ONE [2S+6R, 128] @ [128, 128] f32
  matmul produces half_b/c_coef for all spheres and the six folded
  plane/bounds projections for all rects at once. A short VPU epilogue
  (the shared quadratic_t / rect_t) turns them into candidate t's, and
  a single min + index-min over the primitive (sublane) axis yields the
  winner — the reference's closest-so-far scan (hittable.zig:231-244)
  as one reduction. Ties pick the lowest index, matching the
  reference's strict `t < closest_so_far` scan order.
- The winner's ~25 attributes (geometry + DENORMALIZED material/texture
  constants) are resolved ONCE per bounce by 128-lane dynamic gathers
  from small VMEM tables indexed by the argmin — not carried through
  the march. (Round 2 carried a 19-register select-updated winner state
  through a scalar primitive loop: ~19 selects + ~20 scalar broadcasts
  per primitive. The matmul formulation replaces all of it.)
- RNG is the same PCG4D counter hash as the jnp path (utils/rng.py) at
  the same stream ids, so kernel output matches the jnp integrator to
  float reassociation.
- Per-tile early exit: once every ray in the tile is dead, remaining
  bounce iterations skip the march via lax.cond.
- Segmented tracing + wavefront compaction
  (trace_paths_pallas_compact): measured on the final scene, the alive
  fraction collapses (83% -> 18% -> 1% by bounce 10) but ~90% of tiles
  still hold at least one live ray, so the per-tile exit alone leaves
  ~45x redundant work at depth 50. The driver traces a few bounces per
  kernel call and gathers survivors into a smaller buffer between
  calls. Compacted buffer sizes come from a STATIC per-bounce capacity
  schedule, not from syncing the alive count to the host: on this
  remote-TPU runtime any device->host read permanently degrades
  dispatch (~0.1ms -> ~65ms per op), so the driver never reads device
  data. Correctness is unconditional: the device-side count masks the
  gather, a capacity overflow raises an on-device flag, and the final
  radiance is NaN-poisoned if the flag is set (loud failure, never a
  silently biased image). Compaction is exact: RNG streams are keyed
  by (pixel, sample, bounce), independent of buffer position.

Coverage: spheres (incl. motion), rects (incl. baked rotate/translate),
all four materials, and ALL four texture families — every scene runs
the TPU fast path:
- solid / checker: denormalized per-primitive colors (gathered attrs).
- Perlin noise (reference src/rtw/perlin.zig:47-91): the 256-entry
  permutation + gradient tables live in VMEM as (2, 128) half-rows;
  each lookup is two 128-lane dynamic gathers (`take_along_axis` along
  lanes — the one gather Mosaic supports) plus a select on bit 7. The
  full 7-octave turbulence runs in-register, mirroring utils/perlin.py
  op for op.
- image (reference src/rtw/texture.zig:107-145): texels are packed
  RGBA int32 in [C, 128] VMEM rows (Scene.images_packed); a bounded
  fori_loop walks only the [min, max] chunk range the tile actually
  needs (rays in a tile are spatially coherent, so the range is small)
  and mask-accumulates one lane-gather per chunk. Sphere UV needs
  atan2/acos, which Mosaic lacks — implemented as Cephes-style
  polynomials (~1e-7 rad, see _atan2/_acos).
Noise/image code is compiled only into kernels for scenes that use it
(static has_noise/has_image specialization), and skipped per tile at
run time via lax.cond when no live lane needs it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtweekend_tpu.models.scene import (
    MAT_DIELECTRIC,
    MAT_METAL,
    MAT_LIGHT,
    Scene,
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_NOISE,
)
from rtweekend_tpu.ops import coeffs
from rtweekend_tpu.ops.coeffs import BIG, NF
from rtweekend_tpu.ops.intersect import T_MIN
from rtweekend_tpu.utils.rng import BOUNCE_STREAM0

TILE = 1024  # rays per program: (8, 128)
_NEAR_ZERO = 1e-8

# March matmul precision, and the number of bf16 MXU passes it issues
# (bench.py's roofline accounting). HIGHEST (6-pass, full f32) is
# REQUIRED, not conservatism — both cheaper alternatives were measured
# on the final scene (1200x675, 20 spp, v5e) and rejected:
# - DEFAULT (1 bf16 pass): candidate-t error ~1e-3 relative flips
#   closest-hit decisions en masse (alive fraction at bounce 4
#   inflated 0.097 -> 0.23).
# - "bf16x3" (hand-rolled 3-pass split, Mosaic has no Precision.HIGH):
#   A@B as Ah@Bh + Ah@Bl + Al@Bh with x = hi + lo bf16 halves. The
#   ~2^-16 relative operand error is fatal anyway: the MXU
#   formulation's c_coef row expands |o-c|^2 - r^2 through |beta|^2
#   terms of ~1e6 (the r=1000 ground sphere) that cancel to ~1e3, so a
#   1.5e-5 relative error is ~15 absolute on a quantity needing ~1e-2
#   — grazing hits flip systematically (radiance sum dropped 3.8%).
#   AND it measured 2.5x SLOWER than HIGHEST (18.0 s vs 7.3 s): the
#   f32->bf16 splits + packed-layout relayouts per sublane swamp the
#   saved passes. RTW_MARCH_PRECISION={highest,bf16x3,default} keeps
#   the A/B reproducible.
import os as _os

_MARCH_NAME = _os.environ.get("RTW_MARCH_PRECISION", "highest").lower()
_MARCH_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "bf16x3": jax.lax.Precision.DEFAULT,  # precision of each split pass
    "highest": jax.lax.Precision.HIGHEST,
}[_MARCH_NAME]
_MARCH_PASSES = {"default": 1, "bf16x3": 3, "highest": 6}[_MARCH_NAME]


def _split_bf16(x):
    """x (f32) -> (hi, lo) bf16 with hi + lo ~= x to ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _march_dot(coef_parts, b):
    """The march's [r_coef,128]@[128,N] dot at the configured precision.

    coef_parts: (coef,) f32 for default/highest, or (coef_hi, coef_lo)
    bf16 for bf16x3 (split once per kernel invocation)."""
    if _MARCH_NAME != "bf16x3":
        return jnp.dot(
            coef_parts[0], b,
            preferred_element_type=jnp.float32,
            precision=_MARCH_PRECISION,
        )
    c_hi, c_lo = coef_parts
    b_hi, b_lo = _split_bf16(b)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (
        jnp.dot(c_hi, b_hi, **kw)
        + jnp.dot(c_hi, b_lo, **kw)
        + jnp.dot(c_lo, b_hi, **kw)
    )

# Attribute-table row indices (see _pack_scene). Float rows:
(
    _AF_C0X, _AF_C0Y, _AF_C0Z,          # sphere center c0 (rects: 0)
    _AF_DCX, _AF_DCY, _AF_DCZ,          # sphere center delta
    _AF_T0, _AF_IDT,                    # motion time0 / 1/dt
    _AF_INVR,                           # 1 / radius
    _AF_NX, _AF_NY, _AF_NZ,             # rect world normal (spheres: 0)
    _AF_FUZZ, _AF_IOR,
    _AF_CR, _AF_CG, _AF_CB,             # texture color / checker even
    _AF_C2R, _AF_C2G, _AF_C2B,          # checker odd
    _AF_TSCALE,                         # noise scale
    _AF_UWX, _AF_UWY, _AF_UWZ, _AF_UC,  # rect u(p) affine row
    _AF_VWX, _AF_VWY, _AF_VWZ, _AF_VC,  # rect v(p) affine row
) = range(29)
_N_AF = 29
# Int rows:
_AI_MTYPE, _AI_TTYPE, _AI_IMGW, _AI_IMGH, _AI_IMGBASE = range(5)
_N_AI = 5


def _pack_scene(scene: Scene):
    """Pack the scene for the kernel:

    - coef [2S+6R, 128] f32: the shared coefficient rows (ops/coeffs.py)
      — [hb(S); cc(S); kn(R); dn(R); ua(R); da(R); vb(R); db(R)], NF=17
      feature columns zero-padded to the 128-lane MXU contraction.
    - attr_f [29, C*128] f32 / attr_i [5, C*128] i32: per-primitive
      winner attributes in global-primitive-index order (spheres then
      rects), with materials/textures DENORMALIZED onto primitives
      (the reference's Rc-shared materials become duplicated scalars).
    - Perlin half-row tables and the packed image atlas (unchanged).
    """
    sp, rc = scene.spheres, scene.rects
    mats, tex = scene.materials, scene.textures
    s_pad = sp.radius.shape[0]
    r_pad = rc.k.shape[0]
    p = s_pad + r_pad
    pc = -(-p // 128) * 128

    a_hb, a_cc = coeffs.sphere_coeffs(scene)
    rect6 = coeffs.rect_coeffs(scene)
    coef = jnp.concatenate([a_hb, a_cc, *rect6], axis=0).astype(jnp.float32)
    coef = jnp.pad(coef, ((0, 0), (0, 128 - NF)))

    def cat(s_vals, r_vals):
        v = jnp.concatenate(
            [jnp.asarray(s_vals, jnp.float32), jnp.asarray(r_vals, jnp.float32)]
        )
        return jnp.pad(v, (0, pc - p))

    def cat_i(s_vals, r_vals):
        v = jnp.concatenate(
            [jnp.asarray(s_vals, jnp.int32), jnp.asarray(r_vals, jnp.int32)]
        )
        return jnp.pad(v, (0, pc - p))

    zs = jnp.zeros((s_pad,), jnp.float32)
    zr = jnp.zeros((r_pad,), jnp.float32)
    # guard locally (ADVICE r3): padding spheres can never win (all-zero
    # coef rows -> t = BIG), but don't rely on the builder keeping their
    # radius nonzero — a 0 radius would put inf in the gathered table.
    inv_r = jnp.where(
        sp.active & (sp.radius != 0.0), 1.0 / jnp.where(sp.radius == 0.0, 1.0, sp.radius), 0.0
    )
    ua_w, ua_c, vb_w, vb_c = coeffs.rect_uv_rows(scene)

    def mat_rows(mat_id):
        tid = mats.tex_id[mat_id]
        img = tex.image_id[tid]
        return (
            [
                mats.fuzz[mat_id],
                mats.ior[mat_id],
                tex.color[tid, 0],
                tex.color[tid, 1],
                tex.color[tid, 2],
                tex.color2[tid, 0],
                tex.color2[tid, 1],
                tex.color2[tid, 2],
                tex.scale[tid],
            ],
            [
                mats.mtype[mat_id],
                tex.ttype[tid],
                scene.image_w[img],
                scene.image_h[img],
                scene.image_base[img],
            ],
        )

    s_mf, s_mi = mat_rows(sp.mat_id)
    r_mf, r_mi = mat_rows(rc.mat_id)

    attr_f = jnp.stack(
        [
            cat(sp.c0[:, 0], zr), cat(sp.c0[:, 1], zr), cat(sp.c0[:, 2], zr),
            cat(sp.dc[:, 0], zr), cat(sp.dc[:, 1], zr), cat(sp.dc[:, 2], zr),
            cat(sp.time0, zr), cat(sp.inv_dt, jnp.ones_like(zr)),
            cat(inv_r, zr),
            cat(zs, rc.normal[:, 0]), cat(zs, rc.normal[:, 1]),
            cat(zs, rc.normal[:, 2]),
            cat(s_mf[0], r_mf[0]), cat(s_mf[1], r_mf[1]),
            cat(s_mf[2], r_mf[2]), cat(s_mf[3], r_mf[3]),
            cat(s_mf[4], r_mf[4]),
            cat(s_mf[5], r_mf[5]), cat(s_mf[6], r_mf[6]),
            cat(s_mf[7], r_mf[7]),
            cat(s_mf[8], r_mf[8]),
            cat(zs, ua_w[:, 0]), cat(zs, ua_w[:, 1]), cat(zs, ua_w[:, 2]),
            cat(zs, ua_c),
            cat(zs, vb_w[:, 0]), cat(zs, vb_w[:, 1]), cat(zs, vb_w[:, 2]),
            cat(zs, vb_c),
        ]
    )
    attr_i = jnp.stack(
        [cat_i(a, b) for a, b in zip(s_mi, r_mi)]
    )

    # Perlin tables as (lo, hi) 128-lane half-rows for the in-kernel
    # 2-gather LUT; padded to the (8, 128) int32/f32 min tile.
    zi = jnp.zeros(128, jnp.int32)
    perm = jnp.stack(
        [
            scene.perlin_px[:128], scene.perlin_px[128:],
            scene.perlin_py[:128], scene.perlin_py[128:],
            scene.perlin_pz[:128], scene.perlin_pz[128:],
            zi, zi,
        ]
    ).astype(jnp.int32)
    g = scene.perlin_grad.astype(jnp.float32)
    zf = jnp.zeros(128, jnp.float32)
    grad = jnp.stack(
        [
            g[:128, 0], g[128:, 0],
            g[:128, 1], g[128:, 1],
            g[:128, 2], g[128:, 2],
            zf, zf,
        ]
    )
    return coef, attr_f, attr_i, perm, grad, scene.images_packed


def _pcg4d(a, b, c, d):
    """PCG4D over (8,128) uint32 vectors — same sequence as
    utils/rng.pcg4d, inlined for the Mosaic-supported op set."""
    u = jnp.uint32
    x = a * u(1664525) + u(1013904223)
    y = b * u(1664525) + u(1013904223)
    z = c * u(1664525) + u(1013904223)
    w = d * u(1664525) + u(1013904223)
    x += y * w
    y += z * x
    z += x * y
    w += y * z
    x ^= x >> u(16)
    y ^= y >> u(16)
    z ^= z >> u(16)
    w ^= w >> u(16)
    x += y * w
    y += z * x
    z += x * y
    w += y * z
    return x, y, z, w


def _to_unit(bits):
    # uint32 -> [0,1): top 24 bits; cast routed via an int32 bitcast
    # (Mosaic has no direct uint32->f32 convert). The value fits in 24
    # bits, so the sign is always clear.
    return pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32).astype(
        jnp.float32
    ) * (2.0 ** -24)


def _uniform4(pix_u, smp_u, stream_u, seed_u):
    x, y, z, w = _pcg4d(pix_u, smp_u, stream_u, seed_u)
    return _to_unit(x), _to_unit(y), _to_unit(z), _to_unit(w)


def _gauss4(u0, u1, u2, u3):
    two_pi = 2.0 * jnp.pi
    r0 = jnp.sqrt(-2.0 * jnp.log1p(-u0))
    r1 = jnp.sqrt(-2.0 * jnp.log1p(-u2))
    return (
        r0 * jnp.cos(two_pi * u1),
        r0 * jnp.sin(two_pi * u1),
        r1 * jnp.cos(two_pi * u3),
        r1 * jnp.sin(two_pi * u3),
    )


def _atan2(y, x):
    """atan2 for Mosaic (no atan/atan2 primitive): octant reduction to
    t in [0, 1] + the Cephes atanf polynomial (max err ~1e-7 rad)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.maximum(jnp.where(swap, ay, ax), 1e-30)
    t = num / den  # [0, 1]
    # second Cephes reduction: t > tan(pi/8) -> (t-1)/(t+1), + pi/4
    med = t > 0.4142135623730950
    t = jnp.where(med, (t - 1.0) / (t + 1.0), t)
    z = t * t
    p = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1)
        * z
        - 3.33329491539e-1
    ) * z * t + t
    p = jnp.where(med, 0.25 * jnp.pi + p, p)
    p = jnp.where(swap, 0.5 * jnp.pi - p, p)
    p = jnp.where(x < 0.0, jnp.pi - p, p)
    return jnp.where(y < 0.0, -p, p)


def _acos(c):
    """acos via atan2(sqrt(1-c^2), c); caller clamps |c| < 1."""
    return _atan2(jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0)), c)


def _lut256(lo_row, hi_row, idx):
    """256-entry table lookup: Mosaic only gathers dynamically along the
    128 lanes, so the table is two broadcast (8, 128) half-rows; bit 7
    of the index selects the half."""
    lo = jnp.take_along_axis(lo_row, idx & 127, axis=1)
    hi = jnp.take_along_axis(hi_row, idx & 127, axis=1)
    return jnp.where(idx >= 128, hi, lo)


def _make_kernel(
    s_pad: int,
    r_pad: int,
    n_bounces: int,
    t_min: float,
    has_noise: bool = False,
    has_image: bool = False,
    has_motion: bool = True,
    n_chunks: int = 1,
    want_winners: bool = False,
    has_sky: bool = False,
):
    """Build the kernel body with static primitive counts and segment
    length. Bounce indices run b0..b0+n_bounces (b0 from SMEM), so RNG
    streams continue correctly across segments. has_noise/has_image
    statically compile in the Perlin/image texture paths only for
    scenes that use them; has_motion=False skips the moving-center
    gathers (4 rows) and the per-ray center lerp. want_winners adds a
    per-bounce winner-index output (-1 = miss) — the discrete path
    decisions consumed by the differentiable replay backward
    (ops/pallas/vjp.py). has_sky lerps the two background colors by
    0.5*(unit(d).y + 1) on miss — the book-1 gradient sky of the
    reference's committed golden (see ops/integrator.sky_color)."""
    n_prims = s_pad + r_pad
    attr_chunks = -(-n_prims // 128)

    def kernel(
        coef_ref, af_ref, ai_ref,
        perm_ref, grad_ref, img_ref,
        seed_ref, bg_ref, b0_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
        pid_ref, sid_ref, tr_ref, tg_ref, tb_ref, al_ref,
        rr_ref, rg_ref, rb_ref,
        ox2_ref, oy2_ref, oz2_ref, dx2_ref, dy2_ref, dz2_ref,
        tr2_ref, tg2_ref, tb2_ref, al2_ref, *win_refs,
    ):
        win_ref = win_refs[0] if want_winners else None
        seed_u = seed_ref[0]
        b0 = b0_ref[0]
        bg_r = bg_ref[0]
        bg_g = bg_ref[1]
        bg_b = bg_ref[2]
        if has_sky:
            bg_r1 = bg_ref[3]
            bg_g1 = bg_ref[4]
            bg_b1 = bg_ref[5]

        time = tm_ref[0]
        pix_u = pltpu.bitcast(pid_ref[0], jnp.uint32)
        smp_u = pltpu.bitcast(sid_ref[0], jnp.uint32)

        def gather_f(row, chunk, lane):
            """Winner-attribute gather: attr_f[row][idx] for the (8,128)
            winner-index tile, as per-128-chunk lane gathers + selects."""
            acc = None
            for c in range(attr_chunks):
                rowv = jnp.broadcast_to(
                    af_ref[row:row + 1, c * 128:(c + 1) * 128], (8, 128)
                )
                v = jnp.take_along_axis(rowv, lane, axis=1)
                acc = v if acc is None else jnp.where(chunk == c, v, acc)
            return acc

        def gather_i(row, chunk, lane):
            acc = None
            for c in range(attr_chunks):
                rowv = jnp.broadcast_to(
                    ai_ref[row:row + 1, c * 128:(c + 1) * 128], (8, 128)
                )
                v = jnp.take_along_axis(rowv, lane, axis=1)
                acc = v if acc is None else jnp.where(chunk == c, v, acc)
            return acc

        if has_noise:
            # broadcast the Perlin half-rows once per kernel invocation
            shp = (8, 128)
            px_lo = jnp.broadcast_to(perm_ref[0:1, :], shp)
            px_hi = jnp.broadcast_to(perm_ref[1:2, :], shp)
            py_lo = jnp.broadcast_to(perm_ref[2:3, :], shp)
            py_hi = jnp.broadcast_to(perm_ref[3:4, :], shp)
            pz_lo = jnp.broadcast_to(perm_ref[4:5, :], shp)
            pz_hi = jnp.broadcast_to(perm_ref[5:6, :], shp)
            gx_lo = jnp.broadcast_to(grad_ref[0:1, :], shp)
            gx_hi = jnp.broadcast_to(grad_ref[1:2, :], shp)
            gy_lo = jnp.broadcast_to(grad_ref[2:3, :], shp)
            gy_hi = jnp.broadcast_to(grad_ref[3:4, :], shp)
            gz_lo = jnp.broadcast_to(grad_ref[4:5, :], shp)
            gz_hi = jnp.broadcast_to(grad_ref[5:6, :], shp)

            def perlin_noise(qx, qy, qz):
                """utils/perlin.noise (reference perlin.zig:47-78),
                op-for-op: Hermite-smoothed trilinear interpolation of
                gradient dots over the 8 lattice corners."""
                fx = jnp.floor(qx)
                fy = jnp.floor(qy)
                fz = jnp.floor(qz)
                ux, uy, uz = qx - fx, qy - fy, qz - fz
                ix0 = fx.astype(jnp.int32)
                iy0 = fy.astype(jnp.int32)
                iz0 = fz.astype(jnp.int32)
                sx = ux * ux * (3.0 - 2.0 * ux)
                sy = uy * uy * (3.0 - 2.0 * uy)
                sz = uz * uz * (3.0 - 2.0 * uz)
                accum = jnp.zeros_like(qx)
                for di in range(2):
                    for dj in range(2):
                        for dk in range(2):
                            ix = (ix0 + di) & 255
                            iy = (iy0 + dj) & 255
                            iz = (iz0 + dk) & 255
                            gi = (
                                _lut256(px_lo, px_hi, ix)
                                ^ _lut256(py_lo, py_hi, iy)
                                ^ _lut256(pz_lo, pz_hi, iz)
                            )
                            cx = _lut256(gx_lo, gx_hi, gi)
                            cy = _lut256(gy_lo, gy_hi, gi)
                            cz = _lut256(gz_lo, gz_hi, gi)
                            wx = ux - di
                            wy = uy - dj
                            wz = uz - dk
                            w = (
                                (di * sx + (1 - di) * (1.0 - sx))
                                * (dj * sy + (1 - dj) * (1.0 - sy))
                                * (dk * sz + (1 - dk) * (1.0 - sz))
                            )
                            accum = accum + w * (
                                cx * wx + cy * wy + cz * wz
                            )
                return accum

            def perlin_turb(qx, qy, qz, depth=7):
                """utils/perlin.turb (reference perlin.zig:80-91)."""
                accum = jnp.zeros_like(qx)
                weight = 1.0
                for _ in range(depth):
                    accum = accum + weight * perlin_noise(qx, qy, qz)
                    weight *= 0.5
                    qx, qy, qz = qx * 2.0, qy * 2.0, qz * 2.0
                return jnp.abs(accum)

        # coefficient table read (+ bf16 hi/lo split for the bf16x3
        # march) once per kernel invocation, not per bounce
        coef = coef_ref[:]                              # (2S+6R, 128)
        if _MARCH_NAME == "bf16x3":
            coef_parts = _split_bf16(coef)
        else:
            coef_parts = (coef,)

        def intersect_all(ox, oy, oz, dx, dy, dz):
            """Closest hit over all primitives for the ray tile via the
            MXU coefficient matmul (module docstring). Returns
            (t_best (8,128), idx (8,128) int32) — attributes are
            resolved by the caller's gather pass."""
            o_d = ox * dx + oy * dy + oz * dz
            o_o = ox * ox + oy * oy + oz * oz
            a = dx * dx + dy * dy + dz * dz
            inv_a = 1.0 / a
            one = jnp.ones_like(ox)
            # feature register order must match coeffs.ray_features
            feats = [
                dx, dy, dz,
                time * dx, time * dy, time * dz,
                o_d,
                ox, oy, oz,
                time * ox, time * oy, time * oz,
                time, time * time, o_o,
                one,
            ]
            fstack = jnp.stack(feats, axis=0)          # (NF, 8, 128)
            zpad = jnp.zeros((128 - NF, 128), jnp.float32)
            s, r = s_pad, r_pad
            t_rows, i_rows = [], []
            for sub in range(8):
                b = jnp.concatenate([fstack[:, sub, :], zpad], axis=0)
                # precision: see _march_dot / _MARCH_NAME at module top
                out = _march_dot(coef_parts, b)
                a_s = a[sub:sub + 1, :]
                ia_s = inv_a[sub:sub + 1, :]
                t_sph = coeffs.quadratic_t(
                    out[0:s], out[s:2 * s], a_s, ia_s, t_min
                )
                o2 = 2 * s
                t_rect = coeffs.rect_t(
                    out[o2:o2 + r], out[o2 + r:o2 + 2 * r],
                    out[o2 + 2 * r:o2 + 3 * r], out[o2 + 3 * r:o2 + 4 * r],
                    out[o2 + 4 * r:o2 + 5 * r], out[o2 + 5 * r:o2 + 6 * r],
                    t_min,
                )
                t_all = jnp.concatenate([t_sph, t_rect], axis=0)  # (P,128)
                t_b = jnp.min(t_all, axis=0, keepdims=True)
                iota = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 0)
                idx_b = jnp.min(
                    jnp.where(t_all == t_b, iota, jnp.int32(n_prims)),
                    axis=0, keepdims=True,
                )
                t_rows.append(t_b)
                i_rows.append(idx_b)
            t_best = jnp.concatenate(t_rows, axis=0)   # (8, 128)
            idx = jnp.concatenate(i_rows, axis=0)      # (8, 128)
            return t_best, idx

        def bounce_body(b, carry):
            # alive_f is a float 0/1 mask: Mosaic rejects i1 vectors in
            # loop carries ("unsupported target bitwidth").
            (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, alive_f) = carry
            alive = alive_f > 0.5

            t_best, idx = intersect_all(ox, oy, oz, dx, dy, dz)
            hit = t_best < BIG * 0.5
            t_eff = jnp.where(hit, t_best, 1.0)
            px = ox + t_eff * dx
            py = oy + t_eff * dy
            pz = oz + t_eff * dz

            # ---- winner attribute resolve (one gather pass) ----
            idx_safe = jnp.where(hit, idx, 0)
            chunk = idx_safe >> 7
            lane = idx_safe & 127
            is_s = idx_safe < s_pad

            cx = gather_f(_AF_C0X, chunk, lane)
            cy = gather_f(_AF_C0Y, chunk, lane)
            cz = gather_f(_AF_C0Z, chunk, lane)
            if has_motion:
                # center at each ray's shutter time (hittable.zig:219-221)
                s_t = (time - gather_f(_AF_T0, chunk, lane)) * gather_f(
                    _AF_IDT, chunk, lane
                )
                cx = cx + s_t * gather_f(_AF_DCX, chunk, lane)
                cy = cy + s_t * gather_f(_AF_DCY, chunk, lane)
                cz = cz + s_t * gather_f(_AF_DCZ, chunk, lane)
            inv_r = gather_f(_AF_INVR, chunk, lane)
            rnx = gather_f(_AF_NX, chunk, lane)
            rny = gather_f(_AF_NY, chunk, lane)
            rnz = gather_f(_AF_NZ, chunk, lane)
            fuzz = gather_f(_AF_FUZZ, chunk, lane)
            ior = gather_f(_AF_IOR, chunk, lane)
            cr = gather_f(_AF_CR, chunk, lane)
            cg = gather_f(_AF_CG, chunk, lane)
            cb = gather_f(_AF_CB, chunk, lane)
            c2r = gather_f(_AF_C2R, chunk, lane)
            c2g = gather_f(_AF_C2G, chunk, lane)
            c2b = gather_f(_AF_C2B, chunk, lane)
            mtype = gather_i(_AI_MTYPE, chunk, lane)
            ttype = gather_i(_AI_TTYPE, chunk, lane)

            # outward normal: sphere (p-c)/r vs rect table normal
            onx = jnp.where(is_s, (px - cx) * inv_r, rnx)
            ony = jnp.where(is_s, (py - cy) * inv_r, rny)
            onz = jnp.where(is_s, (pz - cz) * inv_r, rnz)
            d_dot_n = dx * onx + dy * ony + dz * onz
            front = d_dot_n < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            nx = onx * sgn
            ny = ony * sgn
            nz = onz * sgn

            # ---- RNG (same streams as ops/scatter.py) ----
            stream_a = jnp.uint32(BOUNCE_STREAM0) + jnp.uint32(2) * (
                b0 + b
            ).astype(jnp.uint32)
            stream_b = stream_a + jnp.uint32(1)
            sa = jnp.broadcast_to(stream_a, pix_u.shape)
            sb = jnp.broadcast_to(stream_b, pix_u.shape)
            sd = jnp.broadcast_to(seed_u, pix_u.shape)
            ua0, ua1, ua2, ua3 = _uniform4(pix_u, smp_u, sa, sd)
            ub0, ub1, _, _ = _uniform4(pix_u, smp_u, sb, sd)
            g0, g1, g2, _ = _gauss4(ua0, ua1, ua2, ua3)
            g_norm = jnp.sqrt(g0 * g0 + g1 * g1 + g2 * g2)
            g_zero = g_norm == 0.0
            inv_g = jax.lax.rsqrt(
                jnp.where(g_zero, 1.0, g0 * g0 + g1 * g1 + g2 * g2)
            )
            uvx = jnp.where(g_zero, g0, g0 * inv_g)
            uvy = jnp.where(g_zero, g1, g1 * inv_g)
            uvz = jnp.where(g_zero, g2, g2 * inv_g)
            # cbrt via exp/log (Mosaic has no cbrt primitive); u=0 maps
            # to ~1e-10 instead of 0 — immaterial for a fuzz radius.
            crad = jnp.exp(jnp.log(jnp.maximum(ub0, 1e-30)) * (1.0 / 3.0))

            # ---- texture value at hit ----
            sines = jnp.sin(10.0 * px) * jnp.sin(10.0 * py) * jnp.sin(10.0 * pz)
            odd = sines < 0.0
            is_check = ttype == TEX_CHECKER
            tex_r = jnp.where(is_check & odd, c2r, cr)
            tex_g = jnp.where(is_check & odd, c2g, cg)
            tex_b = jnp.where(is_check & odd, c2b, cb)
            live_hit = alive & hit

            if has_noise:
                # 0.5*(1+sin(scale*z + 10*turb)) (texture.zig:100-104);
                # skipped for the whole tile when no live lane needs it.
                tscale = gather_f(_AF_TSCALE, chunk, lane)
                is_noise = ttype == TEX_NOISE
                need_n = live_hit & is_noise

                def noise_gray():
                    turbv = perlin_turb(px, py, pz)
                    return 0.5 * (
                        1.0 + jnp.sin(tscale * pz + 10.0 * turbv)
                    )

                gray = jax.lax.cond(
                    jnp.max(jnp.where(need_n, 1.0, 0.0)) > 0.5,
                    noise_gray,
                    lambda: jnp.zeros_like(px),
                )
                tex_r = jnp.where(is_noise, gray, tex_r)
                tex_g = jnp.where(is_noise, gray, tex_g)
                tex_b = jnp.where(is_noise, gray, tex_b)

            if has_image:
                iw = gather_i(_AI_IMGW, chunk, lane)
                ih = gather_i(_AI_IMGH, chunk, lane)
                ibase = gather_i(_AI_IMGBASE, chunk, lane)
                is_img = ttype == TEX_IMAGE
                need_i = live_hit & is_img

                def image_rgb():
                    # sphere uv (getSphereUv, hittable.zig:145-150) from
                    # the pre-flip outward normal; pole guard matches
                    # ops/intersect.py. Rect uv from the hit point via
                    # the folded affine rows (coeffs.rect_uv_rows).
                    at_pole = (jnp.abs(onz) + jnp.abs(onx)) < 1e-12
                    phi = _atan2(
                        -jnp.where(at_pole, 0.0, onz),
                        jnp.where(at_pole, 1.0, onx),
                    ) + jnp.pi
                    theta = _acos(
                        jnp.clip(-ony, -1.0 + 1e-7, 1.0 - 1e-7)
                    )
                    u_rect = (
                        px * gather_f(_AF_UWX, chunk, lane)
                        + py * gather_f(_AF_UWY, chunk, lane)
                        + pz * gather_f(_AF_UWZ, chunk, lane)
                        + gather_f(_AF_UC, chunk, lane)
                    )
                    v_rect = (
                        px * gather_f(_AF_VWX, chunk, lane)
                        + py * gather_f(_AF_VWY, chunk, lane)
                        + pz * gather_f(_AF_VWZ, chunk, lane)
                        + gather_f(_AF_VC, chunk, lane)
                    )
                    uu = jnp.where(is_s, phi * (0.5 / jnp.pi), u_rect)
                    vv = jnp.where(is_s, theta * (1.0 / jnp.pi), v_rect)
                    # nearest-neighbor texel (texture.zig:120-137 with
                    # the j-clamp bugfix; mirrors ops/textures.py:58-75)
                    iw_f = iw.astype(jnp.float32)
                    ih_f = ih.astype(jnp.float32)
                    uc = jnp.clip(uu, 0.0, 1.0)
                    vc = 1.0 - jnp.clip(vv, 0.0, 1.0)
                    ti = jnp.minimum((uc * iw_f).astype(jnp.int32), iw - 1)
                    tj = jnp.minimum((vc * ih_f).astype(jnp.int32), ih - 1)
                    flat = ibase + tj * iw + ti
                    tchunk = flat >> 7
                    tlane = flat & 127
                    # rays in a tile are spatially coherent: walk only
                    # the chunk range this tile touches
                    c_lo = jnp.clip(
                        jnp.min(
                            jnp.where(need_i, tchunk, jnp.int32(n_chunks))
                        ),
                        0, n_chunks - 1,
                    )
                    c_hi = jnp.clip(
                        jnp.max(jnp.where(need_i, tchunk, -1)),
                        0, n_chunks - 1,
                    )

                    def chunk_body(c, acc):
                        row = jnp.broadcast_to(
                            img_ref[pl.ds(c, 1), :], (8, 128)
                        )
                        g = jnp.take_along_axis(row, tlane, axis=1)
                        return acc + jnp.where(tchunk == c, g, 0)

                    packed = jax.lax.fori_loop(
                        c_lo, c_hi + 1, chunk_body, jnp.zeros_like(tchunk)
                    )
                    inv = 1.0 / 255.0
                    pr = (packed & 255).astype(jnp.float32) * inv
                    pg = ((packed >> 8) & 255).astype(jnp.float32) * inv
                    pb = ((packed >> 16) & 255).astype(jnp.float32) * inv
                    pa = (packed >> 24) & 255
                    # alpha==0 -> ocean blue (texture.zig:138-140)
                    zero_a = pa == 0
                    pr = jnp.where(zero_a, 0.0, pr)
                    pg = jnp.where(zero_a, 0.0, pg)
                    pb = jnp.where(zero_a, 1.0, pb)
                    return pr, pg, pb

                zr = jnp.zeros_like(px)
                img_r, img_g, img_b = jax.lax.cond(
                    jnp.max(jnp.where(need_i, 1.0, 0.0)) > 0.5,
                    image_rgb,
                    lambda: (zr, zr, zr),
                )
                tex_r = jnp.where(is_img, img_r, tex_r)
                tex_g = jnp.where(is_img, img_g, tex_g)
                tex_b = jnp.where(is_img, img_b, tex_b)

            # ---- diffuse (material.zig:41-53) ----
            ddx = nx + uvx
            ddy = ny + uvy
            ddz = nz + uvz
            deg = (
                (jnp.abs(ddx) < _NEAR_ZERO)
                & (jnp.abs(ddy) < _NEAR_ZERO)
                & (jnp.abs(ddz) < _NEAR_ZERO)
            )
            ddx = jnp.where(deg, nx, ddx)
            ddy = jnp.where(deg, ny, ddy)
            ddz = jnp.where(deg, nz, ddz)

            # ---- metal (material.zig:55-66) ----
            d_nsq = dx * dx + dy * dy + dz * dz
            inv_dn = jax.lax.rsqrt(jnp.where(d_nsq == 0.0, 1.0, d_nsq))
            ux = dx * inv_dn
            uy = dy * inv_dn
            uz = dz * inv_dn
            u_dot_n = ux * nx + uy * ny + uz * nz
            rx = ux - 2.0 * u_dot_n * nx
            ry = uy - 2.0 * u_dot_n * ny
            rz = uz - 2.0 * u_dot_n * nz
            mdx = rx + fuzz * (uvx * crad)
            mdy = ry + fuzz * (uvy * crad)
            mdz = rz + fuzz * (uvz * crad)
            metal_alive = (rx * nx + ry * ny + rz * nz) > 0.0

            # ---- dielectric (material.zig:68-92) ----
            ratio = jnp.where(front, 1.0 / ior, ior)
            cos_t = jnp.minimum(-(u_dot_n), 1.0)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-20))
            can_refract = ratio * sin_t <= 1.0
            r0 = (1.0 - ratio) / (1.0 + ratio)
            r0 = r0 * r0
            one_c = 1.0 - cos_t
            one_c5 = one_c * one_c
            one_c5 = one_c5 * one_c5 * one_c
            refl = r0 + (1.0 - r0) * one_c5
            do_refract = can_refract & (refl < ub1)
            perp_x = ratio * (ux + cos_t * nx)
            perp_y = ratio * (uy + cos_t * ny)
            perp_z = ratio * (uz + cos_t * nz)
            perp_sq = perp_x * perp_x + perp_y * perp_y + perp_z * perp_z
            par = -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - perp_sq), 1e-12))
            fdx = perp_x + par * nx
            fdy = perp_y + par * ny
            fdz = perp_z + par * nz
            gdx = jnp.where(do_refract, fdx, rx)
            gdy = jnp.where(do_refract, fdy, ry)
            gdz = jnp.where(do_refract, fdz, rz)

            # ---- select by material ----
            is_metal = mtype == MAT_METAL
            is_diel = mtype == MAT_DIELECTRIC
            is_light = mtype == MAT_LIGHT
            ndx = jnp.where(is_metal, mdx, ddx)
            ndy = jnp.where(is_metal, mdy, ddy)
            ndz = jnp.where(is_metal, mdz, ddz)
            ndx = jnp.where(is_diel, gdx, ndx)
            ndy = jnp.where(is_diel, gdy, ndy)
            ndz = jnp.where(is_diel, gdz, ndz)
            at_r = jnp.where(is_diel, 1.0, tex_r)
            at_g = jnp.where(is_diel, 1.0, tex_g)
            at_b = jnp.where(is_diel, 1.0, tex_b)
            # logical form, not where-on-bools: Mosaic cannot truncate
            # the i8 select result back to an i1 mask
            sc_alive = (is_metal & metal_alive) | (~is_metal & ~is_light)

            # ---- accumulate (main.zig:110-121 semantics) ----
            hit_live = alive & hit
            miss_live = alive & ~hit
            em = hit_live & is_light
            if has_sky:
                # book-1 gradient sky (integrator.sky_color): lerp the
                # two background rows by the unit direction's y. inv_dn
                # above is rsqrt(|d|^2) of the CURRENT direction.
                tsky = 0.5 * (dy * inv_dn + 1.0)
                sky_r = (1.0 - tsky) * bg_r + tsky * bg_r1
                sky_g = (1.0 - tsky) * bg_g + tsky * bg_g1
                sky_b = (1.0 - tsky) * bg_b + tsky * bg_b1
            else:
                sky_r, sky_g, sky_b = bg_r, bg_g, bg_b
            rr = rr + jnp.where(em, tr * tex_r, 0.0) + jnp.where(
                miss_live, tr * sky_r, 0.0
            )
            rg = rg + jnp.where(em, tg * tex_g, 0.0) + jnp.where(
                miss_live, tg * sky_g, 0.0
            )
            rb = rb + jnp.where(em, tb * tex_b, 0.0) + jnp.where(
                miss_live, tb * sky_b, 0.0
            )
            new_alive = hit_live & sc_alive
            tr = jnp.where(new_alive, tr * at_r, tr)
            tg = jnp.where(new_alive, tg * at_g, tg)
            tb = jnp.where(new_alive, tb * at_b, tb)
            ox = jnp.where(new_alive, px, ox)
            oy = jnp.where(new_alive, py, oy)
            oz = jnp.where(new_alive, pz, oz)
            dx = jnp.where(new_alive, ndx, dx)
            dy = jnp.where(new_alive, ndy, dy)
            dz = jnp.where(new_alive, ndz, dz)
            new_alive_f = jnp.where(new_alive, 1.0, 0.0)
            state = (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, new_alive_f)
            winner = jnp.where(hit, idx, jnp.int32(-1))
            return state, winner

        def bounce_guarded(b, carry):
            alive_f = carry[-1]
            new_carry, winner = jax.lax.cond(
                jnp.max(alive_f) > 0.5,
                lambda: bounce_body(b, carry),
                lambda: (carry, jnp.full((8, 128), -1, jnp.int32)),
            )
            if want_winners:
                win_ref[0, b] = winner
            return new_carry

        ox = ox_ref[0]
        zero = jnp.zeros_like(ox)
        init = (
            ox, oy_ref[0], oz_ref[0],
            dx_ref[0], dy_ref[0], dz_ref[0],
            tr_ref[0], tg_ref[0], tb_ref[0],   # throughput (carried in)
            zero, zero, zero,                  # radiance (segment delta)
            al_ref[0],                         # alive (float mask)
        )
        out = jax.lax.fori_loop(0, n_bounces, bounce_guarded, init)
        rr_ref[0] = out[9]
        rg_ref[0] = out[10]
        rb_ref[0] = out[11]
        ox2_ref[0] = out[0]
        oy2_ref[0] = out[1]
        oz2_ref[0] = out[2]
        dx2_ref[0] = out[3]
        dy2_ref[0] = out[4]
        dz2_ref[0] = out[5]
        tr2_ref[0] = out[6]
        tg2_ref[0] = out[7]
        tb2_ref[0] = out[8]
        al2_ref[0] = out[12]

    return kernel


# Flat-state field order for segments/compaction. All [M] f32 except
# pid/sid (int32) and al (f32 0/1 mask).
_STATE_FIELDS = (
    "ox", "oy", "oz", "dx", "dy", "dz", "tm", "pid", "sid",
    "tr", "tg", "tb", "al",
)


def _static_meta(scene: Scene):
    """Static kernel-shape parameters for a scene, passed alongside the
    packed tables (they must be Python ints/bools, not traced)."""
    return dict(
        s_pad=int(scene.spheres.radius.shape[0]),
        r_pad=int(scene.rects.k.shape[0]),
        has_noise=bool(scene.has_noise),
        has_image=bool(scene.has_image),
        has_motion=bool(scene.has_motion),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_bounces", "t_min", "s_pad", "r_pad", "has_noise",
                     "has_image", "has_motion", "interpret", "want_winners"),
)
def _trace_segment(
    tables,         # 6-tuple from _pack_scene —
                    # passed pre-packed so each call carries 6 buffers,
                    # not the ~30-leaf Scene pytree (per-buffer dispatch
                    # overhead is material on the remote-TPU runtime)
    state,          # dict of flat [M] arrays, M % TILE == 0
    seed,
    background,
    b0,             # int32 scalar: global bounce index of segment start
    n_bounces: int,
    t_min: float = T_MIN,
    *,
    s_pad: int,
    r_pad: int,
    has_noise: bool = False,
    has_image: bool = False,
    has_motion: bool = True,
    interpret: bool = False,
    want_winners: bool = False,
):
    """Run one n_bounces kernel segment; returns (radiance [M,3], new
    state dict) — plus winners [n_bounces, M] int32 (-1 = miss) when
    want_winners. Dead lanes (al==0) pass through untouched and add
    nothing to radiance.

    shard_map note: pallas_call cannot satisfy the vma checker
    (jax 0.9: out_shapes would need vma annotations AND the
    interpret-mode jaxpr would need vma-uniform cond branches), so this
    function must only appear inside shard_map regions with
    check_vma=False — which is sound ONLY for forward-only use. Anything
    differentiated must live in a check_vma=True region; parallel/
    shard.py therefore splits winner computation (this kernel, forward
    shard_map) from the differentiable replay (jnp, checked shard_map).
    Round-4 bug when this rule is broken: the psum transpose silently
    mis-reduces and scene grads come out ~3x off."""
    m = state["ox"].shape[0]
    grid = m // TILE

    def tiled(x):
        return x.reshape(grid, 8, 128)

    coef, attr_f, attr_i, perm, grad, images = tables
    background = jnp.asarray(background, jnp.float32)
    has_sky = background.ndim == 2  # (bottom, top) gradient-sky rows
    background = background.reshape(-1)  # SMEM: 3 (flat) or 6 floats
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape(1)
    b0_arr = jnp.asarray(b0, jnp.int32).reshape(1)

    ray_specs = [
        pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(13)
    ]
    out_specs = [
        pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(13)
    ]

    n_chunks = int(images.shape[0])
    kernel = _make_kernel(
        s_pad, r_pad, n_bounces, t_min,
        has_noise, has_image, has_motion, n_chunks, want_winners, has_sky,
    )
    n_prims = s_pad + r_pad
    r_coef = int(coef.shape[0])
    tex_flops = (3000 if has_noise else 0) + (300 if has_image else 0)
    cost = pl.CostEstimate(
        # MXU: 8 sublane matmuls of [r_coef,128]@[128,128] per tile;
        # VPU: ~16 epilogue ops per (ray, prim) + ~250 scatter/gather.
        flops=int(m) * n_bounces * (
            r_coef * 256 + n_prims * 16 + 250 + tex_flops
        ),
        bytes_accessed=int(m) * 26 * 4,
        transcendentals=int(m) * n_bounces * 12,
    )

    table_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
    )
    out_shapes = [
        jax.ShapeDtypeStruct((grid, 8, 128), jnp.float32) for _ in range(13)
    ]
    if want_winners:
        out_specs = out_specs + [
            pl.BlockSpec(
                (1, n_bounces, 8, 128), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        out_shapes.append(
            jax.ShapeDtypeStruct((grid, n_bounces, 8, 128), jnp.int32)
        )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=table_specs + ray_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=cost,
        interpret=interpret,
    )(
        coef, attr_f, attr_i, perm, grad, images,
        seed_arr, background, b0_arr,
        tiled(state["ox"]), tiled(state["oy"]), tiled(state["oz"]),
        tiled(state["dx"]), tiled(state["dy"]), tiled(state["dz"]),
        tiled(state["tm"]),
        tiled(state["pid"]), tiled(state["sid"]),
        tiled(state["tr"]), tiled(state["tg"]), tiled(state["tb"]),
        tiled(state["al"]),
    )
    rr, rg, rb = (x.reshape(m) for x in out[:3])
    new_state = dict(state)
    for name, val in zip(
        ("ox", "oy", "oz", "dx", "dy", "dz", "tr", "tg", "tb", "al"),
        out[3:16],
    ):
        new_state[name] = val.reshape(m)
    rad = jnp.stack([rr, rg, rb], axis=-1)
    if want_winners:
        winners = out[13].transpose(1, 0, 2, 3).reshape(n_bounces, m)
        return rad, new_state, winners
    return rad, new_state


def _init_state(origins, dirs, times, pixel_ids, sample_ids):
    """Pad flat ray arrays to a TILE multiple; padding lanes are dead."""
    n = origins.shape[0]
    m = -(-n // TILE) * TILE

    def pad(x, fill=0.0):
        return jnp.concatenate([x, jnp.full((m - n,), fill, x.dtype)])

    lane = jnp.arange(m, dtype=jnp.int32)
    return dict(
        ox=pad(origins[:, 0]), oy=pad(origins[:, 1]), oz=pad(origins[:, 2]),
        dx=pad(dirs[:, 0]), dy=pad(dirs[:, 1]), dz=pad(dirs[:, 2], 1.0),
        tm=pad(times),
        pid=pad(pixel_ids, 0).astype(jnp.int32),
        sid=pad(sample_ids, 0).astype(jnp.int32),
        tr=jnp.ones(m, jnp.float32), tg=jnp.ones(m, jnp.float32),
        tb=jnp.ones(m, jnp.float32),
        al=(lane < n).astype(jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "t_min", "interpret", "return_winners"),
)
def trace_paths_pallas(
    scene: Scene,
    origins,
    dirs,
    times,
    pixel_ids,
    sample_ids,
    seed,
    background,
    max_depth: int,
    *,
    t_min: float = T_MIN,
    interpret: bool = False,
    return_winners: bool = False,
):
    """Drop-in replacement for ops.integrator.trace_paths on supported
    scenes (f32, forward only). Returns radiance [N, 3]. Jittable; one
    kernel call covering all bounces. Prefer trace_paths_pallas_compact
    from host-level code (it adds wavefront compaction).

    return_winners=True additionally returns the per-bounce closest-hit
    winner indices [max_depth, N] int32 (-1 = miss) — the discrete path
    decisions the differentiable replay backward consumes
    (ops/pallas/vjp.py)."""
    n = origins.shape[0]
    state = _init_state(origins, dirs, times, pixel_ids, sample_ids)
    out = _trace_segment(
        _pack_scene(scene), state, seed, background, jnp.int32(0), max_depth,
        t_min, interpret=interpret, want_winners=return_winners,
        **_static_meta(scene),
    )
    if return_winners:
        rad, _, winners = out
        return rad[:n], winners[:, :n]
    rad, _ = out
    return rad[:n]


@functools.partial(
    jax.jit,
    static_argnames=("n_bounces", "out_cap", "t_min", "s_pad", "r_pad",
                     "has_noise", "has_image", "has_motion", "interpret",
                     "identity_ids"),
    donate_argnames=("total",),
)
def _segment_fused(
    tables,         # packed scene tables (see _trace_segment)
    state,          # dict: _STATE_FIELDS + ray_id, all [cap]
    total,          # [N, 3] radiance accumulator in original ray order
    seed,
    background,
    b0,
    count,          # device int32: alive count after the PREVIOUS segment
    n_bounces: int,
    out_cap: int,   # compacted buffer size; == cap to skip compaction
    t_min: float = T_MIN,
    *,
    s_pad: int,
    r_pad: int,
    has_noise: bool = False,
    has_image: bool = False,
    has_motion: bool = True,
    interpret: bool = False,
    identity_ids: bool = False,  # ray_id == arange (no compaction yet)
):
    """One fused executable per segment: (optional) compaction + kernel
    + radiance scatter-back + alive count. Fusing keeps the glue ops
    inside one XLA program — dispatched separately between Pallas calls
    they each cost 100s of ms on the remote TPU (layout/dispatch
    overhead) vs <1ms fused.

    out_cap comes from the static capacity schedule; the device-side
    `count` (alive count after the previous segment) masks the nonzero
    fill lanes (fills gather the last buffer slot; the `< count` mask
    marks them dead so nothing is double-traced). If count exceeds
    out_cap, alive rays would be dropped — that raises `overflow`
    instead of biasing the image. Returns
    (total, new_state[out_cap], new_count, overflow)."""
    overflow = jnp.bool_(False)
    if out_cap < state["ox"].shape[0]:
        overflow = count > out_cap
        alive = state["al"] > 0.5
        cap_prev = state["ox"].shape[0]
        # fill_value = cap_prev - 1 keeps idx non-strictly ASCENDING
        # (every real entry <= cap_prev - 1 and fills sit at the tail),
        # which legitimizes the indices_are_sorted fast-path hints on
        # the gather below and on the scatter-add (ray_id inherits the
        # ordering: the buffer is always in ascending-ray_id order, so
        # fill lanes gather the largest resident ray_id). Uniqueness is
        # NOT claimed anywhere — fills duplicate.
        idx = jnp.nonzero(alive, size=out_cap, fill_value=cap_prev - 1)[0]
        # ONE row-gather instead of 14 separate 1-D gathers: profiled on
        # v5e, TPU gather cost is per INDEX ROW and nearly independent
        # of row width (each 1-D field gather measured ~70 ms per 2.4M
        # elements; the whole compaction glue was 4.2 s of a 7.3 s
        # render — 8.7x the Pallas kernel itself). Packing the state
        # into [cap, n_fields] f32 lanes turns compaction into a single
        # row-gather. int32 fields ride as bitcast f32 lanes (bits are
        # moved, never computed on).
        order = sorted(state)
        packed = jnp.stack(
            [
                jax.lax.bitcast_convert_type(state[k], jnp.float32)
                if state[k].dtype != jnp.float32 else state[k]
                for k in order
            ],
            axis=1,
        )
        g = jnp.take(packed, idx, axis=0, indices_are_sorted=True)
        state = {
            k: (
                jax.lax.bitcast_convert_type(g[:, i], state[k].dtype)
                if state[k].dtype != jnp.float32 else g[:, i]
            )
            for i, k in enumerate(order)
        }
        # alive-at-idx comes from the packed row (its `al` lane), not a
        # second 1-D gather over the old buffer
        keep = (
            (jnp.arange(out_cap, dtype=jnp.int32) < count)
            & (state["al"] > 0.5)
        )
        state["al"] = keep.astype(jnp.float32)
    ray_id = state["ray_id"]
    rad, st = _trace_segment(
        tables, {k: state[k] for k in _STATE_FIELDS},
        seed, background, b0, n_bounces, t_min,
        s_pad=s_pad, r_pad=r_pad, has_noise=has_noise, has_image=has_image,
        has_motion=has_motion, interpret=interpret,
    )
    # dead/padding lanes produced rad == 0 inside the kernel.
    # `total` is a per-channel (r, g, b) tuple of [N] buffers: three 1-D
    # scatter-adds measured 2.4x FASTER than one [N,3] row scatter on
    # v5e (79 ms vs 193 ms at the bench b3 boundary's 1.82M updates) —
    # the [N,3] target's {0,1:T(4,128)} layout splits each update row
    # across tiles.
    chans = (rad[:, 0], rad[:, 1], rad[:, 2])
    if identity_ids:
        # before the first compaction, ray_id == arange(cap): the
        # scatter-add is a dense add (the 4.05M-row identity scatter
        # alone measured ~0.25 s per batch — ~80x a fused dense add)
        n_out = total[0].shape[0]
        total = tuple(t + c[:n_out] for t, c in zip(total, chans))
    else:
        # ray_id stays ascending through every compaction (see the
        # fill_value note above), so the scatter-add may use XLA's
        # sorted fast path; fill-lane duplicates add rad == 0
        total = tuple(
            t.at[ray_id].add(c, mode="drop", indices_are_sorted=True)
            for t, c in zip(total, chans)
        )
    new_count = jnp.sum(st["al"] > 0.5, dtype=jnp.int32)
    st["ray_id"] = ray_id
    return total, st, new_count, overflow


def _tiles(n: int) -> int:
    return max(TILE, -(-n // TILE) * TILE)


# Capacity schedules: ((bounce, fraction), ...) — entering bounce b, the
# ray buffer shrinks to ceil_tiles(fraction * n_rays). Fractions carry a
# >= 2x margin over the alive fractions measured on the final scene
# (0.35 entering b2, 0.18 b3, 0.10 b4, 0.037 b6, 0.018 b8, 0.008 b12,
# 0.006 b16); overflow NaN-poisons the output rather than dropping rays.
# OPEN: scenes where rays can escape to the background (sky-lit book
# covers) — the alive wavefront collapses within a few bounces.
# Boundaries are deliberately few: every (capacity, length) pair is a
# separate Mosaic executable, and on the remote-TPU runtime each
# uncached compile costs tens of seconds per process.
#
# Tuned r5 against the MEASURED per-row glue costs on v5e (scatter
# ~83 ns, gather ~29 ns, nonzero ~12.5 ns per row; kernel ~6 ns per
# ray-lane-bounce — utils/trace_report on a bench-config render): the
# scatter of each segment's radiance is per ROW of its capacity, so a
# later first boundary with fewer, tighter segments beats r4's
# ((2,.6),(4,.2),(8,.05),(16,.015)) by ~23% modeled glue cost while
# keeping >= 2x alive margins everywhere.
CAPS_OPEN = ((3, 0.45), (6, 0.10), (12, 0.02), (20, 0.010))
# CLOSED: enclosed scenes (Cornell box) — diffuse walls keep most rays
# alive, so only mild late compaction is safe.
CAPS_CLOSED = ((8, 0.7), (16, 0.55), (32, 0.4))


def trace_paths_pallas_compact(
    scene: Scene,
    origins,
    dirs,
    times,
    pixel_ids,
    sample_ids,
    seed,
    background,
    max_depth: int,
    *,
    t_min: float = T_MIN,
    interpret: bool = False,
    capacities=CAPS_OPEN,
    return_overflow: bool = False,
):
    """Wavefront tracer with static-schedule compaction (see module
    docstring). Host control flow between jitted segment calls, but NO
    device->host reads — safe for the remote-TPU dispatch fast path.
    Semantically identical to trace_paths_pallas (same RNG streams,
    same per-ray accumulation order).

    Returns radiance [N, 3], all-NaN iff a capacity overflowed (never a
    silently biased image). With return_overflow=True, returns
    (radiance, overflow_flag) UN-poisoned instead, so the caller can
    recover by re-tracing the batch uncompacted (see render.render)."""
    n = origins.shape[0]
    state = _init_state(origins, dirs, times, pixel_ids, sample_ids)
    state["ray_id"] = jnp.arange(state["ox"].shape[0], dtype=jnp.int32)
    # per-channel 1-D accumulators (see the scatter note in
    # _segment_fused); stacked to [n, 3] once at the end
    total = tuple(jnp.zeros((n,), jnp.float32) for _ in range(3))
    tables = jax.jit(_pack_scene)(scene)
    meta = _static_meta(scene)

    # Sort + dedupe the schedule: a capacity is only a *shrink* point, so
    # an unsorted user schedule would otherwise skip boundaries silently.
    caps = sorted(
        {b: _tiles(int(f * n)) for b, f in capacities if 0 < b < max_depth}
        .items()
    )
    boundaries = [b for b, _ in caps] + [max_depth]
    cap_at = dict(caps)

    b = 0
    cap = state["ox"].shape[0]
    full_cap = cap
    count_dev = jnp.int32(n)
    overflow = jnp.bool_(False)
    while b < max_depth:
        nxt = next(x for x in boundaries if x > b)
        out_cap = min(cap, cap_at.get(b, cap))
        total, state, count_dev, ovf = _segment_fused(
            tables, state, total, seed, background, jnp.int32(b), count_dev,
            nxt - b, out_cap, t_min, interpret=interpret,
            identity_ids=(out_cap == full_cap), **meta,
        )
        overflow = overflow | ovf
        cap = out_cap
        b = nxt
    total = jnp.stack(total, axis=-1)  # [n, 3]
    if return_overflow:
        return total, overflow
    return jnp.where(overflow, jnp.float32(jnp.nan), total)
