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
from rtweekend_tpu.ops.intersect import intersect
from rtweekend_tpu.ops.scatter import scatter


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
            miss_live[:, None], throughput * background[None, :], zero3
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
