"""Differentiable fast path: Pallas march + differentiable path replay.

The Pallas megakernel (ops/pallas/megakernel.py) is forward-only — its
select-carried in-register state has no Mosaic autodiff. Earlier rounds
paired it with a custom_vjp whose backward ran `jax.vjp` of the FULL jnp
wavefront integrator — an O(N x P x depth) candidate march per gradient
step that (a) was ~10x slower than the forward and (b) could not trace
under shard_map (jax 0.9: `jax.vjp` inside a custom_vjp bwd rule raises
NotImplementedError on ShardMapTracer).

This module replaces both problems with the REPLAY design:

1. The kernel runs the closest-hit march once and, besides radiance,
   emits the per-bounce winner indices [depth, N] (-1 = miss) — the
   complete set of DISCRETE path decisions (closest-hit argmin winners;
   reference hittable.zig:231-244). Everything else a path does is a
   deterministic function of (scene, rays, counter-RNG).
2. `trace_paths_replay` (ops/integrator.py) re-traces exactly those
   paths differentiably: per bounce it gathers ONLY the winning
   primitive (O(N) instead of O(N x P)) and reuses the same scatter /
   accumulate math and RNG streams as the jnp integrator. Its output
   equals the full trace up to f32 reassociation in the winner's root.

The returned value IS the replay's output, so `trace_paths_fast` is an
ordinary differentiable function — no custom_vjp, no `jax.vjp` inside a
bwd rule — and traces cleanly under shard_map, jit, and grad. The
gradient is the detached-sampling estimator of grad.py's docstring:
discrete events (argmin visibility, Schlick Bernoulli via detached RNG,
metal absorption) carry no gradient; the smooth integrand along the
sampled paths carries all of it. Gradients flow to the scene's float
leaves (sphere centers/radii, albedo/texture colors, fuzz, ior,
emission), the ray origins/dirs/times, and the background color.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtweekend_tpu.models.scene import Scene
from rtweekend_tpu.ops.intersect import T_MIN
from rtweekend_tpu.ops.pallas.megakernel import trace_paths_pallas
from rtweekend_tpu.ops.replay import trace_paths_replay_fast


def trace_paths_fast(
    scene: Scene,
    origins,
    dirs,
    times,
    pixel_ids,
    sample_ids,
    seed,
    background,
    max_depth: int,
    t_min: float = T_MIN,
    interpret: bool = False,
):
    """Drop-in differentiable trace_paths: the Pallas megakernel decides
    the paths, the jnp replay differentiates them. Use exactly like
    ops.integrator.trace_paths.

    NOT for use inside a check_vma=True shard_map (pallas_call cannot
    satisfy the vma checker) — parallel/shard.py instead computes the
    winners in a forward-only shard_map and feeds them to the replay as
    a sharded input."""
    # stop_gradient on every kernel input: no tangents may enter the
    # pallas_call (Mosaic has no autodiff rule); the kernel contributes
    # only the discrete winners, which carry no gradient by definition.
    sg = jax.lax.stop_gradient
    _, winners = trace_paths_pallas(
        sg(scene), sg(origins), sg(dirs), sg(times), pixel_ids, sample_ids,
        seed, sg(background), max_depth, t_min=t_min, interpret=interpret,
        return_winners=True,
    )
    winners = jax.lax.stop_gradient(winners)
    return trace_paths_replay_fast(
        scene, origins, dirs, times, pixel_ids, sample_ids, seed,
        background, winners, t_min=t_min, remat=True,
    )
