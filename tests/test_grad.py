"""Gradient correctness: analytic (detached-sampling) grads vs central
finite differences, plus an end-to-end inverse-render recovery
(BASELINE.json north star + config 5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtweekend_tpu.grad import fit, make_loss, render_mean
from rtweekend_tpu.models.scene import (
    Dielectric,
    Diffuse,
    Metal,
    SceneBuilder,
    Solid,
)
from rtweekend_tpu.ops.camera import make_camera
from rtweekend_tpu.ops.integrator import trace_paths
from rtweekend_tpu.parallel.shard import extract_params, merge_params

SEED = jnp.uint32(3)


def _interior_rays(n=512):
    """Rays aimed well inside a unit sphere at (0,0,-3)'s silhouette so
    tiny parameter perturbations cannot flip the hit set (the detached
    estimator has no silhouette term; FD must see a smooth integrand)."""
    o = jnp.tile(jnp.array([[0.0, 0.0, 0.0]]), (n, 1))
    g = np.random.default_rng(0).uniform(-0.08, 0.08, (n, 2))
    d = jnp.stack(
        [jnp.asarray(g[:, 0], jnp.float32), jnp.asarray(g[:, 1], jnp.float32),
         jnp.full(n, -1.0)], axis=1
    )
    pid = jnp.arange(n, dtype=jnp.int32)
    sid = jnp.zeros(n, jnp.int32)
    return o, d, jnp.zeros(n), pid, sid


def _mean_radiance(scene, depth=4):
    o, d, t, pid, sid = _interior_rays()
    rad = trace_paths(
        scene, o, d, t, pid, sid, SEED, jnp.array([1.0, 1.0, 1.0]), depth,
        remat=True,
    )
    return jnp.mean(rad)


def _fd_check(build_fn, get_leaf, set_leaf, idx, eps, rtol, depth=4):
    """Central finite difference on one scalar scene parameter."""
    scene = build_fn()
    params = extract_params(scene)

    def f(params):
        return _mean_radiance(merge_params(scene, params), depth)

    g = jax.grad(f)(params)
    analytic = float(get_leaf(g)[idx])

    p_plus = jax.tree.map(lambda x: x, params)
    p_minus = jax.tree.map(lambda x: x, params)
    p_plus = set_leaf(p_plus, idx, float(get_leaf(params)[idx]) + eps)
    p_minus = set_leaf(p_minus, idx, float(get_leaf(params)[idx]) - eps)
    fd = (float(f(p_plus)) - float(f(p_minus))) / (2 * eps)
    np.testing.assert_allclose(analytic, fd, rtol=rtol, atol=1e-4)


def _sphere_scene(mat):
    def build():
        b = SceneBuilder()
        b.add_sphere((0.0, 0.0, -3.0), 1.0, b.material(mat))
        return b.build()

    return build


def _set_color(p, idx, val):
    p["color"] = p["color"].at[idx].set(val)
    return p


def _set_c0(p, idx, val):
    p["c0"] = p["c0"].at[idx].set(val)
    return p


def _set_scalar(key):
    def s(p, idx, val):
        p[key] = p[key].at[idx].set(val)
        return p

    return s


def test_albedo_gradient_fd():
    build = _sphere_scene(Diffuse(albedo=Solid((0.5, 0.3, 0.2))))
    scene = build()
    tid = int(scene.materials.tex_id[0])
    _fd_check(
        build, lambda p: p["color"], _set_color, (tid, 0), eps=1e-3, rtol=2e-3
    )


def test_center_gradient_fd():
    build = _sphere_scene(Diffuse(albedo=Solid((0.5, 0.3, 0.2))))
    _fd_check(
        build, lambda p: p["c0"], _set_c0, (0, 2), eps=1e-4, rtol=0.05
    )


def test_radius_gradient_fd():
    build = _sphere_scene(Diffuse(albedo=Solid((0.5, 0.3, 0.2))))
    _fd_check(
        build, lambda p: p["radius"], _set_scalar("radius"), 0, eps=1e-4,
        rtol=0.05,
    )


def test_fuzz_gradient_fd():
    build = _sphere_scene(Metal(albedo=(0.8, 0.7, 0.6), fuzz=0.3))
    _fd_check(
        build, lambda p: p["fuzz"], _set_scalar("fuzz"), 0, eps=1e-3, rtol=0.05
    )


def test_ior_gradient_fd():
    build = _sphere_scene(Dielectric(ir=1.5))
    _fd_check(
        build, lambda p: p["ior"], _set_scalar("ior"), 0, eps=1e-3, rtol=0.1,
        depth=6,
    )


def test_inverse_render_recovers_albedo():
    """Config 5: perturb albedo, recover it from the target image."""
    def build(albedo):
        b = SceneBuilder()
        b.add_sphere((0.0, 0.0, -2.0), 0.8, b.material(Diffuse(albedo=Solid(albedo))))
        return b.build()

    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 40.0, 1.0, 0.0, 1.0)
    W = H = 24
    true_scene = build((0.6, 0.25, 0.45))
    target = render_mean(
        true_scene, cam, (0.8, 0.8, 0.8), jnp.uint32(9),
        width=W, height=H, spp=8, max_depth=4,
    )

    start_scene = build((0.3, 0.5, 0.2))
    tid = int(true_scene.materials.tex_id[0])
    fitted, history = fit(
        start_scene, cam, target, (0.8, 0.8, 0.8),
        width=W, height=H, spp=4, max_depth=4,
        steps=60, learning_rate=0.05, seed=1,
        param_mask={"color": True},
    )
    assert history[-1] < history[0] * 0.2, history[::10]
    got = np.asarray(fitted.textures.color[tid])
    np.testing.assert_allclose(got, [0.6, 0.25, 0.45], atol=0.08)


def test_pallas_vjp_matches_jnp_grad():
    """trace_paths_fast (Pallas forward + remat'd jnp backward,
    ops/pallas/vjp.py): its gradient must equal jax.grad of the jnp
    integrator — the backward IS the jnp VJP — and its forward value
    must be the Pallas kernel's (interpret mode on CPU)."""
    from rtweekend_tpu.ops.pallas.vjp import trace_paths_fast

    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, -3.0), 1.0, b.material(Diffuse(albedo=Solid((0.5, 0.3, 0.2)))))
    scene = b.build()
    o, d, t, pid, sid = _interior_rays(n=256)
    bg = jnp.array([1.0, 1.0, 1.0])
    depth = 4
    params = extract_params(scene)

    def f_fast(params):
        sc = merge_params(scene, params)
        return jnp.mean(
            trace_paths_fast(sc, o, d, t, pid, sid, SEED, bg, depth,
                             1e-3, True)
        )

    def f_jnp(params):
        sc = merge_params(scene, params)
        return jnp.mean(
            trace_paths(sc, o, d, t, pid, sid, SEED, bg, depth, remat=True)
        )

    v_fast, g_fast = jax.value_and_grad(f_fast)(params)
    v_jnp, g_jnp = jax.value_and_grad(f_jnp)(params)
    # forward: pallas kernel value (different quadratic formulation ->
    # tiny f32 drift vs jnp)
    np.testing.assert_allclose(float(v_fast), float(v_jnp), rtol=1e-4)
    # backward: identical functions -> identical grads
    for k in g_jnp:
        np.testing.assert_allclose(
            np.asarray(g_fast[k]), np.asarray(g_jnp[k]), rtol=1e-6, atol=1e-8
        )


def test_render_mean_use_pallas(monkeypatch):
    """render_mean(use_pallas=True) runs end to end and matches the jnp
    version closely (fast forward, same backward)."""
    from jax.experimental.pallas import tpu as pltpu

    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, -3.0), 1.0, b.material(Diffuse(albedo=Solid((0.5, 0.3, 0.2)))))
    scene = b.build()
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0, 0.0, 1.0)
    with pltpu.force_tpu_interpret_mode():
        img_fast = render_mean(
            scene, cam, (1.0, 1.0, 1.0), SEED,
            width=8, height=8, spp=2, max_depth=3, use_pallas=True,
        )
    img_jnp = render_mean(
        scene, cam, (1.0, 1.0, 1.0), SEED,
        width=8, height=8, spp=2, max_depth=3,
    )
    np.testing.assert_allclose(
        np.asarray(img_fast), np.asarray(img_jnp), rtol=1e-4, atol=1e-5
    )
