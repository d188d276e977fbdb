"""Camera basis and ray-generation tests vs a NumPy oracle transcribed
from reference src/main.zig:52-100."""

import jax.numpy as jnp
import numpy as np

from rtweekend_tpu.ops.camera import generate_rays, make_camera


def oracle_camera(look_from, look_at, vup, vfov, aspect, aperture, focus_dist):
    theta = np.radians(vfov)
    h = np.tan(theta / 2)
    vh = 2.0 * h
    vw = aspect * vh
    w = look_from - look_at
    w = w / np.linalg.norm(w)
    u = np.cross(vup, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    origin = look_from
    horizontal = u * (vw * focus_dist)
    vertical = v * (vh * focus_dist)
    lower_left = origin - horizontal / 2 - vertical / 2 - w * focus_dist
    return origin, horizontal, vertical, lower_left, u, v, w


def test_camera_basis_cornell():
    lf = np.array([278.0, 278.0, -800.0])
    la = np.array([278.0, 278.0, 0.0])
    vup = np.array([0.0, 1.0, 0.0])
    cam = make_camera(lf, la, vup, 40.0, 1.0, 0.0, 10.0)
    o, hz, vt, ll, u, v, w = oracle_camera(lf, la, vup, 40.0, 1.0, 0.0, 10.0)
    np.testing.assert_allclose(cam.origin, o, rtol=1e-6)
    np.testing.assert_allclose(cam.horizontal, hz, rtol=1e-5)
    np.testing.assert_allclose(cam.vertical, vt, rtol=1e-5)
    np.testing.assert_allclose(cam.lower_left, ll, rtol=1e-5)
    np.testing.assert_allclose(cam.u, u, atol=1e-6)
    np.testing.assert_allclose(cam.v, v, atol=1e-6)
    np.testing.assert_allclose(cam.w, w, atol=1e-6)


def test_rays_hit_viewport():
    """Center pixel's ray must pass near look direction; corner rays near
    viewport corners (zero aperture -> origin exact)."""
    lf = np.array([13.0, 2.0, 3.0])
    la = np.array([0.0, 0.0, 0.0])
    cam = make_camera(lf, la, (0, 1, 0), 20.0, 1.5, 0.0, 10.0)
    W = H = 101
    center = jnp.array([(H // 2) * W + W // 2], jnp.int32)
    o, d, t = generate_rays(cam, W, H, center, jnp.zeros(1, jnp.int32), jnp.uint32(0))
    np.testing.assert_allclose(np.asarray(o)[0], lf, rtol=1e-6)
    dn = np.asarray(d)[0] / np.linalg.norm(np.asarray(d)[0])
    look = la - lf
    look = look / np.linalg.norm(look)
    # jitter moves the ray < 1 pixel; viewport half-angle is 10 deg
    assert dn @ look > np.cos(np.radians(0.5))
    assert (np.asarray(t) >= 0).all() and (np.asarray(t) <= 1).all()


def test_rays_deterministic_and_batch_invariant():
    cam = make_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, 1.0, 0.2, 1.0)
    pid = jnp.arange(64, dtype=jnp.int32)
    sid = jnp.zeros(64, jnp.int32)
    o1, d1, t1 = generate_rays(cam, 8, 8, pid, sid, jnp.uint32(3))
    # Same ids in a different batch layout (two halves) must give the
    # exact same rays: the sharding-invariance property.
    o2a, d2a, t2a = generate_rays(cam, 8, 8, pid[:32], sid[:32], jnp.uint32(3))
    o2b, d2b, t2b = generate_rays(cam, 8, 8, pid[32:], sid[32:], jnp.uint32(3))
    np.testing.assert_array_equal(np.asarray(o1), np.concatenate([o2a, o2b]))
    np.testing.assert_array_equal(np.asarray(d1), np.concatenate([d2a, d2b]))
    np.testing.assert_array_equal(np.asarray(t1), np.concatenate([t2a, t2b]))
