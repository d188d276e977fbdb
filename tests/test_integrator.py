"""Integrator semantics tests: the wavefront product-accumulate must
reproduce the reference recursion emitted + atten * rayColor(...)
(reference src/main.zig:103-122)."""

import jax.numpy as jnp
import numpy as np

from rtweekend_tpu.models.scene import (
    Dielectric,
    Diffuse,
    DiffuseLight,
    Metal,
    SceneBuilder,
    Solid,
)
from rtweekend_tpu.ops.integrator import trace_paths

SEED = jnp.uint32(5)


def _trace(scene, o, d, background, depth, n=None):
    o = jnp.atleast_2d(jnp.asarray(o, jnp.float32))
    if n:
        o = jnp.tile(o, (n, 1))
    d = jnp.broadcast_to(jnp.asarray(d, jnp.float32), o.shape)
    N = o.shape[0]
    return trace_paths(
        scene,
        o,
        d,
        jnp.zeros(N),
        jnp.arange(N, dtype=jnp.int32),
        jnp.zeros(N, jnp.int32),
        SEED,
        jnp.asarray(background, jnp.float32),
        depth,
    )


def test_miss_returns_background():
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, b.material(Diffuse(albedo=Solid((0.5, 0.5, 0.5)))))
    rad = _trace(b.build(), [0, 10, 0], [0, 1, 0], (0.7, 0.8, 1.0), 5)
    np.testing.assert_allclose(rad[0], [0.7, 0.8, 1.0], rtol=1e-6)


def test_depth_zero_semantics():
    """max_depth bounces then black (main.zig:105-108): a ray bouncing
    inside a closed diffuse box forever contributes only up to depth."""
    b = SceneBuilder()
    m = b.material(Diffuse(albedo=Solid((1.0, 1.0, 1.0))))
    b.add_box((-10, -10, -10), (10, 10, 10), m)
    rad = _trace(b.build(), [0, 0, 0], [0, 0, -1], (0, 0, 0), 4, n=64)
    # black background + perfect white albedo + no lights = 0 radiance
    np.testing.assert_allclose(np.asarray(rad), 0.0, atol=1e-6)


def test_light_direct_hit():
    b = SceneBuilder()
    b.add_rect(
        "xy", -1, 1, -1, 1, -2.0, b.material(DiffuseLight(emit=Solid((4, 4, 4))))
    )
    rad = _trace(b.build(), [0, 0, 0], [0, 0, -1], (0, 0, 0), 5)
    np.testing.assert_allclose(rad[0], [4, 4, 4], rtol=1e-6)


def test_single_bounce_diffuse_to_background():
    """One diffuse bounce then miss: radiance = albedo * background
    exactly, independent of the sampled direction, for a lone sphere
    hanging in a uniform background (the product-accumulate identity)."""
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, b.material(Diffuse(albedo=Solid((0.5, 0.25, 0.125)))))
    rad = np.asarray(
        _trace(b.build(), [0, 0, 0], [0, 0, -1], (1.0, 1.0, 1.0), 8, n=512)
    )
    # Most rays bounce off to the background after 1 hit; a few re-hit
    # the sphere (tangent) and pick up albedo^2. Mean must be close to
    # albedo * background, strictly between albedo^2 and albedo.
    mean = rad.mean(axis=0)
    assert (mean <= np.array([0.5, 0.25, 0.125]) + 1e-6).all()
    assert (mean >= np.array([0.5, 0.25, 0.125]) * 0.85).all()


def test_metal_mirror_chain():
    """Two facing mirrors with a light behind a gap: throughput is
    albedo^k after k reflections — check energy decays geometrically."""
    b = SceneBuilder()
    metal = b.material(Metal(albedo=(0.5, 0.5, 0.5), fuzz=0.0))
    b.add_rect("xy", -10, 10, -10, 10, -5.0, metal)
    rad1 = _trace(b.build(), [0, 0, 0], [0, 0, -1], (1, 1, 1), 8)
    # one mirror bounce back to background: 0.5 * 1
    np.testing.assert_allclose(rad1[0], 0.5, rtol=1e-5)


def test_dielectric_preserves_energy():
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, b.material(Dielectric(ir=1.5)))
    rad = np.asarray(_trace(b.build(), [0, 0, 0], [0, 0, -1], (1, 1, 1), 16, n=256))
    # attenuation == 1: every path eventually escapes to the white
    # background with unit throughput
    np.testing.assert_allclose(rad.mean(axis=0), 1.0, atol=0.02)
