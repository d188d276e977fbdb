"""Intersection tests vs scalar NumPy oracles transcribed from
reference src/rtw/hittable.zig (sphere quadratic :96-116, rect plane
solve :279-303, RotateY/Translate instancing :472-608)."""

import jax.numpy as jnp
import numpy as np

from rtweekend_tpu.models.scene import Diffuse, SceneBuilder, Solid
from rtweekend_tpu.ops.intersect import BIG, intersect


def _mat(b):
    return b.material(Diffuse(albedo=Solid((0.5, 0.5, 0.5))))


def _run(builder, o, d, time=None):
    scene = builder.build()
    o = jnp.asarray(np.atleast_2d(o), jnp.float32)
    d = jnp.asarray(np.atleast_2d(d), jnp.float32)
    t = (
        jnp.zeros(o.shape[0], jnp.float32)
        if time is None
        else jnp.asarray(np.atleast_1d(time), jnp.float32)
    )
    return intersect(scene, o, d, t)


def test_sphere_frontal_hit():
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, _mat(b))
    h = _run(b, [0, 0, 0], [0, 0, -1])
    assert bool(h.hit[0])
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)
    np.testing.assert_allclose(h.p[0], [0, 0, -4], atol=1e-5)
    np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-5)
    assert bool(h.front_face[0])


def test_sphere_inside_hit_flips_normal():
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 2.0, _mat(b))
    h = _run(b, [0, 0, 0], [0, 0, -1])
    assert bool(h.hit[0])
    np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-5)
    # outward normal (0,0,-1), ray dir (0,0,-1): dot > 0 -> back face,
    # normal flipped to (0,0,1) (hittable.zig:121-126).
    assert not bool(h.front_face[0])
    np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-5)


def test_sphere_miss_and_t_min():
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, _mat(b))
    h = _run(b, [[0, 3, 0], [0, 0, -4.9995]], [[0, 0, -1], [0, 0, -1]])
    assert not bool(h.hit[0])
    assert h.t[0] >= BIG * 0.5
    # origin just inside the sphere: near root is negative (< t_min) and
    # skipped, the far root through the back is taken (hittable.zig:109-116)
    assert bool(h.hit[1])
    np.testing.assert_allclose(h.t[1], 1.0005, rtol=1e-3)


def test_sphere_uv():
    # getSphereUv (hittable.zig:145-150): point (1,0,0) -> phi=atan2(0,1)+pi
    # = pi -> u=0.5; theta=acos(0)=pi/2 -> v=0.5.
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.0, _mat(b))
    h = _run(b, [5, 0, 0], [-1, 0, 0])
    np.testing.assert_allclose(h.u[0], 0.5, atol=1e-5)
    np.testing.assert_allclose(h.v[0], 0.5, atol=1e-5)
    # +y pole: theta = acos(-1) = pi -> v = 1 (up to the 1e-7 acos-input
    # clamp that keeps pole gradients finite; |dv| <= ~1.5e-4 there)
    h2 = _run(b, [0, 5, 0], [0, -1, 0])
    np.testing.assert_allclose(h2.v[0], 1.0, atol=2e-4)


def test_moving_sphere_center_lerp():
    b = SceneBuilder()
    b.add_moving_sphere((0, 0, -5), (2, 0, -5), 0.0, 1.0, 0.5, _mat(b))
    # at time 0 center x=0; at time 1 center x=2 (hittable.zig:219-221)
    h0 = _run(b, [0, 0, 0], [0, 0, -1], time=0.0)
    h1 = _run(b, [0, 0, 0], [0, 0, -1], time=1.0)
    h1b = _run(b, [2, 0, 0], [0, 0, -1], time=1.0)
    assert bool(h0.hit[0]) and not bool(h1.hit[0]) and bool(h1b.hit[0])
    np.testing.assert_allclose(h0.t[0], 4.5, rtol=1e-5)
    # halfway
    hh = _run(b, [1, 0, 0], [0, 0, -1], time=0.5)
    assert bool(hh.hit[0])


def test_rect_families_normals_and_uv():
    b = SceneBuilder()
    m = _mat(b)
    b.add_rect("xy", 0, 2, 0, 4, -1.0, m)  # z = -1 plane
    h = _run(b, [0.5, 1.0, 5.0], [0, 0, -1])
    assert bool(h.hit[0])
    np.testing.assert_allclose(h.t[0], 6.0, rtol=1e-6)
    np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(h.u[0], 0.25, atol=1e-6)  # (0.5-0)/2
    np.testing.assert_allclose(h.v[0], 0.25, atol=1e-6)  # (1-0)/4

    b2 = SceneBuilder()
    b2.add_rect("xz", 0, 2, 0, 4, 1.0, _mat(b2))  # y = 1 plane
    h2 = _run(b2, [1.0, 5.0, 2.0], [0, -1, 0])
    assert bool(h2.hit[0])
    np.testing.assert_allclose(h2.normal[0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(h2.u[0], 0.5, atol=1e-6)
    np.testing.assert_allclose(h2.v[0], 0.5, atol=1e-6)

    b3 = SceneBuilder()
    b3.add_rect("yz", 0, 2, 0, 4, -2.0, _mat(b3))  # x = -2 plane
    h3 = _run(b3, [3.0, 1.0, 2.0], [-1, 0, 0])
    assert bool(h3.hit[0])
    np.testing.assert_allclose(h3.t[0], 5.0, rtol=1e-6)
    np.testing.assert_allclose(h3.normal[0], [1, 0, 0], atol=1e-6)


def test_rect_bounds_reject():
    b = SceneBuilder()
    b.add_rect("xy", 0, 2, 0, 4, -1.0, _mat(b))
    h = _run(b, [[2.5, 1.0, 5.0], [0.5, 4.5, 5.0]], [[0, 0, -1], [0, 0, -1]])
    assert not bool(h.hit[0]) and not bool(h.hit[1])


def test_rect_parallel_ray_no_hit():
    b = SceneBuilder()
    b.add_rect("xy", 0, 2, 0, 4, -1.0, _mat(b))
    h = _run(b, [0.5, 1.0, 5.0], [1, 0, 0])  # dir.z == 0
    assert not bool(h.hit[0])


def test_translate_bakes_into_rect():
    """Translate semantics (hittable.zig:478-489): offset ray, hit, add
    offset back — equivalent to shifting the rect."""
    b = SceneBuilder()
    b.add_rect("xy", 0, 2, 0, 2, 0.0, _mat(b), offset=(10.0, 5.0, -3.0))
    h = _run(b, [11.0, 6.0, 5.0], [0, 0, -1])
    assert bool(h.hit[0])
    np.testing.assert_allclose(h.t[0], 8.0, rtol=1e-6)
    np.testing.assert_allclose(h.p[0], [11.0, 6.0, -3.0], atol=1e-5)
    np.testing.assert_allclose(h.u[0], 0.5, atol=1e-6)


def test_rotate_y_oracle():
    """RotateY world->object->world round trip vs a scalar oracle
    (hittable.zig:558-596) for an xy rect rotated 30 degrees."""
    theta = np.radians(30.0)
    c, s = np.cos(theta), np.sin(theta)
    b = SceneBuilder()
    b.add_rect("xy", -1, 1, -1, 1, 0.0, _mat(b), rot_y=theta)

    o = np.array([0.3, 0.2, 5.0])
    d = np.array([0.05, -0.02, -1.0])

    # oracle: rotate ray into object space (hittable.zig:563-567)
    def w2o(v):
        return np.array([c * v[0] - s * v[2], v[1], s * v[0] + c * v[2]])

    oo, do = w2o(o), w2o(d)
    t = (0.0 - oo[2]) / do[2]
    xh, yh = oo[0] + t * do[0], oo[1] + t * do[1]
    assert abs(xh) <= 1 and abs(yh) <= 1  # sanity: oracle hit

    h = _run(b, o, d)
    assert bool(h.hit[0])
    np.testing.assert_allclose(h.t[0], t, rtol=1e-5)
    # world-space hit point is just ray.at(t) — the instance transform
    # round-trips (hittable.zig:584-587)
    np.testing.assert_allclose(h.p[0], o + t * d, rtol=1e-5)
    # world normal: object (0,0,1) rotated back (hittable.zig:588-590)
    n_world = np.array([c * 0 + s * 1, 0.0, -s * 0 + c * 1])
    if n_world @ d > 0:
        n_world = -n_world
    np.testing.assert_allclose(h.normal[0], n_world, atol=1e-5)


def test_closest_hit_wins():
    b = SceneBuilder()
    m = _mat(b)
    b.add_sphere((0, 0, -10), 1.0, m)
    b.add_sphere((0, 0, -5), 1.0, m)
    b.add_rect("xy", -5, 5, -5, 5, -20.0, m)
    h = _run(b, [0, 0, 0], [0, 0, -1])
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-5)  # nearer sphere


def test_mixed_scene_rect_wins():
    b = SceneBuilder()
    m = _mat(b)
    b.add_sphere((0, 0, -10), 1.0, m)
    b.add_rect("xy", -5, 5, -5, 5, -3.0, m)
    h = _run(b, [0, 0, 0], [0, 0, -1])
    np.testing.assert_allclose(h.t[0], 3.0, rtol=1e-5)
    np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-6)
