"""SPMD rendering and inverse-rendering over a ('tiles', 'samples') mesh.

The reference has no distributed backend at all (SURVEY.md §2/§5); this
is the TPU-native scaling design: pixel tiles sharded over one mesh
axis, sample batches over the other, scene parameters replicated, and
scene-parameter gradients reduced with psum over ICI. Because the
counter-based RNG keys every draw by (seed, pixel_id, sample_id), a
sharded render draws the exact same samples as the single-device render
of the same (width, height, spp, seed); results agree to float
reassociation tolerance (~1e-5, XLA compiles each shard shape
independently).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from rtweekend_tpu.models.scene import Scene
from rtweekend_tpu.ops.camera import Camera, generate_rays
from rtweekend_tpu.ops.integrator import trace_paths
from rtweekend_tpu.parallel.mesh import SAMPLE_AXIS, TILE_AXIS


def _cross_ids(pixel_ids, sample_ids):
    np_l, ns_l = pixel_ids.shape[0], sample_ids.shape[0]
    pids = jnp.repeat(pixel_ids, ns_l)
    sids = jnp.tile(sample_ids, np_l)
    return pids, sids


def _local_radiance_sums(scene, camera, background, seed, pixel_ids, sample_ids,
                         width, height, max_depth, remat=False,
                         use_pallas=False, interpret=False):
    """Per-pixel radiance sums over this device's (pixel, sample) shard.

    use_pallas=True traces each shard's rays with the Pallas megakernel
    — differentiable via the custom-VJP wrapper (ops/pallas/vjp.py), so
    the same flag serves render_sharded and sharded_train_step. The
    counter RNG keys every draw by (pixel, sample), so the kernel path
    draws the identical samples per shard as the jnp path.
    interpret=True runs the kernel in Pallas interpret mode (CPU virtual
    meshes: tests and the driver's multi-chip dry run)."""
    pids, sids = _cross_ids(pixel_ids, sample_ids)
    o, d, t = generate_rays(camera, width, height, pids, sids, seed)
    if use_pallas:
        from rtweekend_tpu.ops.pallas.vjp import trace_paths_fast

        rad = trace_paths_fast(
            scene, o, d, t, pids, sids, seed, background, max_depth,
            interpret=interpret,
        )
    else:
        rad = trace_paths(
            scene, o, d, t, pids, sids, seed, background, max_depth,
            remat=remat,
        )
    return jnp.sum(
        rad.reshape(pixel_ids.shape[0], sample_ids.shape[0], 3), axis=1
    )


def render_sharded(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    samples_per_pixel: int,
    max_depth: int,
    background,
    seed,
    mesh: Mesh,
    *,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Distributed render; returns the radiance SUM framebuffer [H, W, 3]
    (same samples as the single-device render at the same seed).

    use_pallas runs the TPU megakernel per shard under shard_map — the
    flagship configuration (BASELINE.json north star: kernel sharded
    over the ('tiles','samples') mesh)."""
    n_tiles = mesh.shape[TILE_AXIS]
    n_samp = mesh.shape[SAMPLE_AXIS]
    n_pix = width * height
    if n_pix % n_tiles or samples_per_pixel % n_samp:
        raise ValueError(
            f"pixels {n_pix} / spp {samples_per_pixel} not divisible by "
            f"mesh {mesh.shape}"
        )
    background = jnp.asarray(background, camera.origin.dtype)
    seed = jnp.uint32(seed)
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    sample_ids = jnp.arange(samples_per_pixel, dtype=jnp.int32)

    # check_vma=False when the Pallas kernel runs inside the shard:
    # pallas_call's out_shape carries no varying-mesh-axes annotation,
    # which the vma checker (jax >= 0.7) rejects outright.
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(TILE_AXIS), P(SAMPLE_AXIS)),
        out_specs=P(TILE_AXIS),
        check_vma=not use_pallas,
    )
    def run(scene, camera, background, seed, pix_shard, samp_shard):
        sums = _local_radiance_sums(
            scene, camera, background, seed, pix_shard, samp_shard,
            width, height, max_depth,
            use_pallas=use_pallas, interpret=interpret,
        )
        return jax.lax.psum(sums, SAMPLE_AXIS)

    sums = run(scene, camera, background, seed, pixel_ids, sample_ids)
    # psum over samples leaves each sample-rank with the full pixel sums;
    # out_specs P(TILE_AXIS) re-concatenates pixel shards.
    return sums.reshape(height, width, 3)[::-1]


def extract_params(scene: Scene):
    """The differentiable parameter set required by BASELINE.json: sphere
    centers/radii, texture colors (albedo), metal fuzz, dielectric ior."""
    return {
        "c0": scene.spheres.c0,
        "radius": scene.spheres.radius,
        "color": scene.textures.color,
        "fuzz": scene.materials.fuzz,
        "ior": scene.materials.ior,
    }


def merge_params(scene: Scene, params) -> Scene:
    return dataclasses.replace(
        scene,
        spheres=dataclasses.replace(
            scene.spheres, c0=params["c0"], radius=params["radius"]
        ),
        textures=dataclasses.replace(scene.textures, color=params["color"]),
        materials=dataclasses.replace(
            scene.materials, fuzz=params["fuzz"], ior=params["ior"]
        ),
    )


def sharded_train_step(
    scene: Scene,
    camera: Camera,
    target,  # [H, W, 3] mean-radiance target image
    width: int,
    height: int,
    samples_per_pixel: int,
    max_depth: int,
    background,
    seed,
    mesh: Mesh,
    lr: float = 0.01,
    *,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """One SGD step of inverse rendering (BASELINE.json config 5),
    sharded over the mesh: forward + backward through the path tracer,
    scene-parameter grads psum'd over both mesh axes (ICI), parameters
    replicated. Returns (params, loss).

    use_pallas runs each shard's forward through the Pallas megakernel
    (custom-VJP wrapper, ops/pallas/vjp.py); the backward remains the
    remat'd jnp VJP, psum-transposed across the mesh exactly like the
    jnp path.

    The loss is MSE between the spp-mean radiance and `target`
    (rows in framebuffer orientation, flipped internally to the
    reference's bottom-up v axis, main.zig:396).
    """
    n_tiles = mesh.shape[TILE_AXIS]
    n_samp = mesh.shape[SAMPLE_AXIS]
    n_pix = width * height
    if n_pix % n_tiles or samples_per_pixel % n_samp:
        raise ValueError("indivisible mesh decomposition")
    background = jnp.asarray(background, camera.origin.dtype)
    seed = jnp.uint32(seed)
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)
    sample_ids = jnp.arange(samples_per_pixel, dtype=jnp.int32)
    # target in pixel-id order (bottom-up rows)
    target_flat = jnp.asarray(target, camera.origin.dtype)[::-1].reshape(n_pix, 3)
    params = extract_params(scene)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(TILE_AXIS), P(SAMPLE_AXIS), P(TILE_AXIS)),
        out_specs=(P(), P()),
        check_vma=not use_pallas,  # see render_sharded
    )
    def step(params, scene, camera, background, seed, pix_shard, samp_shard, tgt_shard):
        def loss_fn(params):
            sc = merge_params(scene, params)
            sums = _local_radiance_sums(
                sc, camera, background, seed, pix_shard, samp_shard,
                width, height, max_depth, remat=True,
                use_pallas=use_pallas, interpret=interpret,
            )
            mean = jax.lax.psum(sums, SAMPLE_AXIS) / samples_per_pixel
            err = mean - tgt_shard
            local = jnp.sum(err * err)
            return jax.lax.psum(local, TILE_AXIS) / (n_pix * 3)

        # No explicit grad psum: the autodiff transpose of the in-graph
        # psums already reduces each device's shard contribution across
        # the mesh (verified against the unsharded jax.grad in
        # tests/test_sharding.py), so the returned grads are global.
        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    return step(
        params, scene, camera, background, seed, pixel_ids, sample_ids, target_flat
    )
