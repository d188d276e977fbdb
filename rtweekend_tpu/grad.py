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


def _pick_chunk(n_pix: int, spp: int, rays_per_chunk: int) -> int:
    """Largest sample count that divides spp with n_pix * chunk rays
    within the workspace budget (one compiled shape, bounded memory)."""
    chunk = max(1, min(spp, rays_per_chunk // max(n_pix, 1)))
    while chunk > 1 and spp % chunk:
        chunk -= 1
    return chunk


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_depth", "use_pallas", "rays_per_chunk"
    ),
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
    rays_per_chunk: int = 1 << 20,
):
    """Differentiable mean-radiance framebuffer [H, W, 3] (row 0 = top).

    use_pallas=False: jnp integrator with per-bounce remat, fully
    differentiable end to end. use_pallas=True: the Pallas megakernel
    decides the paths and the differentiable replay integrates them
    (ops/pallas/vjp.trace_paths_fast) — the TPU fast path for both the
    forward render and gradient steps.

    Samples are traced in chunks of `rays_per_chunk` rays (a lax.scan
    over sample batches, remat'd per chunk), so inverse rendering
    scales to full-size framebuffers instead of materializing all
    W x H x spp rays at once (VERDICT r2 #9).
    """
    n_pix = width * height
    seed = jnp.uint32(seed)
    bg = jnp.asarray(background, camera.origin.dtype)
    chunk = _pick_chunk(n_pix, spp, rays_per_chunk)
    pixel_ids = jnp.repeat(jnp.arange(n_pix, dtype=jnp.int32), chunk)
    sample_base = jnp.tile(jnp.arange(chunk, dtype=jnp.int32), n_pix)

    def trace_chunk(sample_start):
        sample_ids = sample_base + sample_start
        o, d, t = generate_rays(
            camera, width, height, pixel_ids, sample_ids, seed
        )
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
        return jnp.sum(rad.reshape(n_pix, chunk, 3), axis=1)

    if chunk == spp:
        sums = trace_chunk(jnp.int32(0))
    else:
        def body(acc, s0):
            return acc + trace_chunk(s0), None

        starts = jnp.arange(0, spp, chunk, dtype=jnp.int32)
        sums, _ = jax.lax.scan(
            jax.checkpoint(body), jnp.zeros((n_pix, 3), bg.dtype), starts
        )
    mean = sums / spp
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
