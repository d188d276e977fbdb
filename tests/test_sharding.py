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
    running per shard under shard_map. Both paths intersect via the
    SAME coefficient rows (ops/coeffs.py), so on this all-rect scene
    the interpret-mode kernel matches the jnp shards exactly."""
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
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_sharded_train_step(setup):
    """sharded_train_step(use_pallas=True): Pallas forward per shard,
    remat'd jnp backward, psum'd grads — loss and grads must match the
    jnp sharded step (same samples, same integrand)."""
    from rtweekend_tpu.parallel.shard import extract_params

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
    np.testing.assert_allclose(float(loss_pl), float(loss_jnp), rtol=1e-5)
    for k in p_jnp:
        np.testing.assert_allclose(
            np.asarray(p_pl[k]), np.asarray(p_jnp[k]), rtol=1e-4, atol=1e-6
        )
