"""Iterative wavefront path integrator.

The reference integrates by linear recursion —
emitted + attenuation * rayColor(scattered, depth-1)
(reference src/main.zig:103-122) — which rewrites mechanically into an
iterative product-accumulate: per bounce, `radiance += throughput *
emitted` (plus `throughput * background` on miss) and `throughput *=
attenuation`. Mathematically identical (SURVEY.md §2.13), but the loop
is a lax.scan over the bounce index with every ray in flight at once,
which is the shape XLA/TPU wants: fixed trip count, static shapes, no
recursion, no divergence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtweekend_tpu.models.scene import Scene
from rtweekend_tpu.ops.intersect import intersect, intersect_winner
from rtweekend_tpu.ops.scatter import scatter


def sky_color(background, d):
    """Per-ray miss radiance [N, 3].

    background [3]: the reference HEAD's flat background color
    (main.zig:110-112) — returned as-is, bit-identical to the pre-sky
    code path. background [2, 3] = (bottom, top): the book-1 gradient
    sky lerped by t = 0.5 * (unit(d).y + 1) — the sky of the
    reference's committed golden render (RayTracingInOneWeekend.png;
    its top sky rows match (1-t)*white + t*(0.5, 0.7, 1.0), not HEAD's
    flat (0.7, 0.8, 1.0))."""
    bg = jnp.asarray(background)
    if bg.ndim == 1:
        return jnp.broadcast_to(bg, d.shape)
    d_sq = jnp.sum(d * d, axis=-1)
    inv = jax.lax.rsqrt(jnp.where(d_sq == 0.0, 1.0, d_sq))
    t = 0.5 * (d[:, 1] * inv + 1.0)
    return (1.0 - t)[:, None] * bg[0] + t[:, None] * bg[1]


def trace_paths(
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
    remat: bool = False,
):
    """Trace a batch of camera rays to radiance.

    origins/dirs [N,3], times [N]; pixel_ids/sample_ids [N] int32 and
    seed uint32 drive the counter-based RNG; background [3]. Returns
    radiance [N, 3].

    `remat=True` rematerializes each bounce in the backward pass
    (hit records are recomputable from (ray, scene), so recompute is
    cheaper than storing 50 bounces of carries).
    """
    background = jnp.asarray(background, dtype=origins.dtype)
    n = origins.shape[0]
    zero3 = jnp.zeros_like(origins)

    def bounce(carry, bounce_idx):
        o, d, throughput, radiance, alive = carry

        hit = intersect(scene, o, d, times)
        sc = scatter(scene, seed, pixel_ids, sample_ids, bounce_idx, d, hit)

        hit_live = alive & hit.hit
        miss_live = alive & ~hit.hit

        # emitted is added unconditionally before the scatter test
        # (main.zig:116-121); misses collect the background (:110-112).
        radiance = radiance + jnp.where(
            hit_live[:, None], throughput * sc.emitted, zero3
        )
        radiance = radiance + jnp.where(
            miss_live[:, None], throughput * sky_color(background, d), zero3
        )

        new_alive = hit_live & sc.alive
        throughput = jnp.where(
            new_alive[:, None], throughput * sc.attenuation, throughput
        )
        o = jnp.where(new_alive[:, None], hit.p, o)
        d = jnp.where(new_alive[:, None], sc.direction, d)
        return (o, d, throughput, radiance, new_alive), None

    if remat:
        bounce = jax.checkpoint(bounce)

    # alive is derived from a traced input (times == times is all-True)
    # rather than a literal so its sharding/varying axes match the other
    # carries under shard_map.
    init = (
        origins,
        dirs,
        jnp.ones_like(origins),           # throughput
        zero3,                            # radiance
        times == times,                   # alive (all True)
    )
    (_, _, _, radiance, _), _ = jax.lax.scan(
        bounce, init, jnp.arange(max_depth, dtype=jnp.int32)
    )
    return radiance


def trace_paths_replay(
    scene: Scene,
    origins,
    dirs,
    times,
    pixel_ids,
    sample_ids,
    seed,
    background,
    winners,
    *,
    t_min: float = 1e-3,
    remat: bool = True,
):
    """Differentiable replay of paths whose per-bounce closest-hit
    winners are already known (ops/pallas/vjp.py design).

    `winners` [max_depth, N] int32 holds the global primitive index the
    full march chose at each bounce (-1 = miss). Each bounce then costs
    O(N) winner gathers (intersect_winner) instead of the O(N x P)
    candidate march — the scatter/accumulate math is byte-identical to
    trace_paths (same counter-RNG streams keyed by (pixel, sample,
    bounce), reference main.zig:103-122 semantics), so the replayed
    radiance equals the full trace up to f32 reassociation in the
    winner's root. Fully differentiable; winners are integers and carry
    no gradient by construction.
    """
    background = jnp.asarray(background, dtype=origins.dtype)
    zero3 = jnp.zeros_like(origins)

    def bounce(carry, xs):
        bounce_idx, winner = xs
        o, d, throughput, radiance, alive = carry

        hit = intersect_winner(scene, o, d, times, winner, t_min)
        sc = scatter(scene, seed, pixel_ids, sample_ids, bounce_idx, d, hit)

        hit_live = alive & hit.hit
        miss_live = alive & ~hit.hit

        radiance = radiance + jnp.where(
            hit_live[:, None], throughput * sc.emitted, zero3
        )
        radiance = radiance + jnp.where(
            miss_live[:, None], throughput * sky_color(background, d), zero3
        )

        new_alive = hit_live & sc.alive
        throughput = jnp.where(
            new_alive[:, None], throughput * sc.attenuation, throughput
        )
        o = jnp.where(new_alive[:, None], hit.p, o)
        d = jnp.where(new_alive[:, None], sc.direction, d)
        return (o, d, throughput, radiance, new_alive), None

    if remat:
        bounce = jax.checkpoint(bounce)

    max_depth = winners.shape[0]
    init = (
        origins,
        dirs,
        jnp.ones_like(origins),
        zero3,
        times == times,
    )
    xs = (jnp.arange(max_depth, dtype=jnp.int32), winners)
    (_, _, _, radiance, _), _ = jax.lax.scan(bounce, init, xs)
    return radiance
