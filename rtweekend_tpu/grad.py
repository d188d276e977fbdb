"""Differentiable rendering and inverse rendering.

The reference has no gradients at all; this module delivers the
BASELINE.json north star: pixel-radiance gradients w.r.t. sphere
centers/radii, albedo (texture colors), metal fuzz, and dielectric ior,
via reparameterized/detached-sampling path tracing:

- every RNG draw is an integer-hash counter (utils/rng.py) — no gradient
  flows into sampling, which IS detached sampling;
- discrete events (closest-hit argmin, Schlick reflect/refract choice,
  metal absorption) contribute no gradient — the estimator
  differentiates the smooth integrand along fixed paths (correct for
  interior regions; silhouette terms are not estimated, the standard
  detached trade-off);
- the bounce scan rematerializes per bounce (`remat=True`), so the
  backward pass recomputes hit records instead of storing
  max_depth x rays x carry.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rtweekend_tpu.models.scene import Scene
from rtweekend_tpu.ops.camera import Camera, generate_rays
from rtweekend_tpu.ops.integrator import trace_paths
from rtweekend_tpu.parallel.shard import extract_params, merge_params


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "use_pallas"),
)
def render_mean(
    scene: Scene,
    camera: Camera,
    background,
    seed,
    *,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    use_pallas: bool = False,
):
    """Differentiable mean-radiance framebuffer [H, W, 3] (row 0 = top).

    use_pallas=False: jnp integrator with per-bounce remat, fully
    differentiable end to end. use_pallas=True: the Pallas megakernel
    forward paired with the remat'd jnp backward through
    ops/pallas/vjp.trace_paths_fast — the TPU fast path for both the
    forward render and gradient steps.
    """
    n_pix = width * height
    pixel_ids = jnp.repeat(jnp.arange(n_pix, dtype=jnp.int32), spp)
    sample_ids = jnp.tile(jnp.arange(spp, dtype=jnp.int32), n_pix)
    seed = jnp.uint32(seed)
    o, d, t = generate_rays(camera, width, height, pixel_ids, sample_ids, seed)
    bg = jnp.asarray(background, o.dtype)
    if use_pallas:
        from rtweekend_tpu.ops.pallas.vjp import trace_paths_fast

        rad = trace_paths_fast(
            scene, o, d, t, pixel_ids, sample_ids, seed, bg, max_depth
        )
    else:
        rad = trace_paths(
            scene, o, d, t, pixel_ids, sample_ids, seed, bg, max_depth,
            remat=True,
        )
    mean = jnp.mean(rad.reshape(n_pix, spp, 3), axis=1)
    return mean.reshape(height, width, 3)[::-1]


def make_loss(
    scene: Scene,
    camera: Camera,
    target,
    background,
    seed,
    *,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    use_pallas: bool = False,
) -> Callable[[Dict], jnp.ndarray]:
    """MSE(mean-radiance render, target) as a function of the
    differentiable parameter dict (see parallel.shard.extract_params)."""
    target = jnp.asarray(target)

    def loss(params):
        sc = merge_params(scene, params)
        img = render_mean(
            sc, camera, background, seed,
            width=width, height=height, spp=spp, max_depth=max_depth,
            use_pallas=use_pallas,
        )
        return jnp.mean((img - target) ** 2)

    return loss


def fit(
    scene: Scene,
    camera: Camera,
    target,
    background,
    *,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    steps: int = 100,
    learning_rate: float = 0.05,
    seed: int = 0,
    param_mask: Optional[Dict[str, bool]] = None,
    verbose: bool = False,
    use_pallas: bool = False,
) -> Tuple[Scene, list]:
    """Inverse rendering (BASELINE.json config 5): recover scene
    parameters from a target image by Adam descent through the tracer.

    Each step uses a fresh RNG seed (a new MC sample of the gradient) —
    stochastic gradient descent over path space. `param_mask` restricts
    which parameter groups update (e.g. {"color": True} to fit albedo
    only). Returns (fitted scene, loss history).
    """
    import optax

    params = extract_params(scene)
    mask = {k: True for k in params}
    if param_mask is not None:
        mask = {k: param_mask.get(k, False) for k in params}

    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @functools.partial(jax.jit, donate_argnames=("params", "opt_state"))
    def step_fn(params, opt_state, step_seed):
        loss_fn = make_loss(
            scene, camera, target, background, step_seed,
            width=width, height=height, spp=spp, max_depth=max_depth,
            use_pallas=use_pallas,
        )
        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = {k: jnp.where(mask[k], g, 0.0) for k, g in grads.items()}
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    history = []
    for i in range(steps):
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.uint32(seed * 131071 + i)
        )
        history.append(float(loss))
        if verbose and i % 10 == 0:
            print(f"step {i}: loss {history[-1]:.6f}")
    return merge_params(scene, params), history
