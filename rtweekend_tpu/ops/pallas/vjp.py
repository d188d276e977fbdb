"""Differentiable fast path: Pallas forward + remat'd jnp backward.

The Pallas megakernel (ops/pallas/megakernel.py) is forward-only — its
select-carried in-register state has no Mosaic autodiff. This module
pairs it with the jnp wavefront integrator's VJP through a custom_vjp:

- primal  = trace_paths_pallas (the TPU speed-of-light forward),
- backward = jax.vjp of ops.integrator.trace_paths with remat=True
  (per-bounce rematerialization: hit records are recomputed from
  (ray, scene), so the backward stores no bounce carries).

Both paths consume the SAME counter-based RNG streams keyed by
(pixel, sample, bounce), so they walk the same light paths: the
backward differentiates the very integrand the forward sampled, up to
f32 reassociation in the quadratic (see tests/test_pallas.py parity
notes). Discrete events (closest-hit argmin, Schlick Bernoulli, metal
absorption) carry no gradient — the detached-sampling estimator of
grad.py's module docstring.

Gradients flow to the scene's float leaves (sphere centers/radii,
albedo/texture colors, fuzz, ior, emission), the ray origins/dirs/
times, and the background color. Integer inputs (pixel/sample ids,
seed) get symbolic-zero (float0) cotangents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rtweekend_tpu.models.scene import Scene
from rtweekend_tpu.ops.integrator import trace_paths
from rtweekend_tpu.ops.intersect import T_MIN
from rtweekend_tpu.ops.pallas.megakernel import trace_paths_pallas


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
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
    """Drop-in differentiable trace_paths whose forward runs the Pallas
    megakernel. Use exactly like ops.integrator.trace_paths."""
    return trace_paths_pallas(
        scene, origins, dirs, times, pixel_ids, sample_ids, seed,
        background, max_depth, t_min=t_min, interpret=interpret,
    )


def _fwd(
    scene, origins, dirs, times, pixel_ids, sample_ids, seed, background,
    max_depth, t_min, interpret,
):
    out = trace_paths_pallas(
        scene, origins, dirs, times, pixel_ids, sample_ids, seed,
        background, max_depth, t_min=t_min, interpret=interpret,
    )
    # Residuals are just the inputs: the remat'd backward re-traces.
    res = (scene, origins, dirs, times, pixel_ids, sample_ids, seed,
           background)
    return out, res


def _float0(x):
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _bwd(max_depth, t_min, interpret, res, g):
    (scene, origins, dirs, times, pixel_ids, sample_ids, seed,
     background) = res

    # Every residual is an explicit jax.vjp argument — closing over
    # residual tracers breaks under shard_map (jax 0.9 ShardMapTracer
    # has no lift for closure capture into an inner vjp trace).
    def f(scene, origins, dirs, times, pixel_ids, sample_ids, seed,
          background):
        return trace_paths(
            scene, origins, dirs, times, pixel_ids, sample_ids, seed,
            background, max_depth, remat=True,
        )

    _, vjp = jax.vjp(
        f, scene, origins, dirs, times, pixel_ids, sample_ids, seed,
        background,
    )
    d_scene, d_o, d_d, d_t, _, _, _, d_bg = vjp(g)
    return (
        d_scene, d_o, d_d, d_t,
        _float0(pixel_ids), _float0(sample_ids), _float0(seed),
        d_bg,
    )


trace_paths_fast.defvjp(_fwd, _bwd)
