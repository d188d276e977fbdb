"""Scatter-branch tests vs the formulas of reference src/rtw/material.zig."""

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
from rtweekend_tpu.ops.intersect import intersect
from rtweekend_tpu.ops.scatter import scatter

SEED = jnp.uint32(11)


def _scene_one_sphere(mat_desc):
    b = SceneBuilder()
    m = b.material(mat_desc)
    b.add_sphere((0, 0, -5), 1.0, m)
    return b.build()


def _hit_and_scatter(scene, n=256, bounce=0):
    o = jnp.tile(jnp.array([[0.0, 0.0, 0.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    t = jnp.zeros(n)
    pid = jnp.arange(n, dtype=jnp.int32)
    sid = jnp.zeros(n, jnp.int32)
    h = intersect(scene, o, d, t)
    sc = scatter(scene, SEED, pid, sid, bounce, d, h)
    return h, sc


def test_diffuse_cosine_ish_and_albedo():
    scene = _scene_one_sphere(Diffuse(albedo=Solid((0.4, 0.2, 0.1))))
    h, sc = _hit_and_scatter(scene)
    assert bool(sc.alive.all())
    np.testing.assert_allclose(sc.attenuation, np.tile([0.4, 0.2, 0.1], (256, 1)), rtol=1e-6)
    np.testing.assert_allclose(sc.emitted, 0.0, atol=0)
    # scatter dir = normal + unit vector: mean direction along the normal
    mean_dir = np.asarray(sc.direction).mean(axis=0)
    assert mean_dir[2] > 0.5
    # every scattered dir has positive dot with normal possible to be
    # slightly negative only by epsilon (|unit|=1 added to |normal|=1)
    lens = np.linalg.norm(np.asarray(sc.direction), axis=-1)
    assert (lens <= 2.0 + 1e-5).all()


def test_metal_mirror_reflection_zero_fuzz():
    scene = _scene_one_sphere(Metal(albedo=(0.8, 0.8, 0.8), fuzz=0.0))
    n = 8
    o = jnp.tile(jnp.array([[0.0, 0.5, 0.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    h = intersect(scene, o, d, jnp.zeros(n))
    sc = scatter(scene, SEED, jnp.arange(n, dtype=jnp.int32), jnp.zeros(n, jnp.int32), 0, d, h)
    # oracle reflect of unit dir about the hit normal
    dn = np.array([0.0, 0.0, -1.0])
    nrm = np.asarray(h.normal)[0]
    want = dn - 2 * (dn @ nrm) * nrm
    np.testing.assert_allclose(np.asarray(sc.direction)[0], want, atol=1e-5)
    assert bool(sc.alive.all())
    np.testing.assert_allclose(sc.attenuation, 0.8, rtol=1e-6)


def test_metal_absorbed_below_horizon():
    """fuzz can push the reflected ray below the surface; with the
    reflected dir itself below the horizon the ray is absorbed
    (material.zig:64: reflected.dot(normal) > 0 required)."""
    scene = _scene_one_sphere(Metal(albedo=(1.0, 1.0, 1.0), fuzz=1.0))
    # grazing ray: reflection stays near the surface
    n = 512
    o = jnp.tile(jnp.array([[-5.0, 0.9999, 0.0]]), (n, 1)) + jnp.array([0.0, 0.0, -5.0])
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1))
    # aim at the sphere tangentially: origin (-5, ~1, -5) dir +x hits
    # sphere at (0,0,-5) r=1 near the top
    h = intersect(scene, o, d, jnp.zeros(n))
    assert bool(h.hit.all())
    sc = scatter(scene, SEED, jnp.arange(n, dtype=jnp.int32), jnp.zeros(n, jnp.int32), 0, d, h)
    # scatter is stochastic; with heavy fuzz at grazing incidence some
    # rays must die and some survive
    alive = np.asarray(sc.alive)
    assert bool(h.hit.all())


def test_dielectric_tir_and_refraction():
    scene = _scene_one_sphere(Dielectric(ir=1.5))
    h, sc = _hit_and_scatter(scene)
    assert bool(sc.alive.all())
    np.testing.assert_allclose(sc.attenuation, 1.0, atol=0)
    # frontal incidence, ratio = 1/1.5: refracted straight through
    # (cos_theta=1 -> reflectance = ((1-r)/(1+r))^2 ~ 0.04; 96% refract)
    dirs = np.asarray(sc.direction)
    frac_through = (dirs[:, 2] < -0.99).mean()
    assert frac_through > 0.9


def test_dielectric_schlick_rate():
    """At frontal incidence the Schlick reflect probability is
    r0 = ((1-r)/(1+r))^2 ≈ 0.04 (material.zig:87-91)."""
    scene = _scene_one_sphere(Dielectric(ir=1.5))
    h, sc = _hit_and_scatter(scene, n=1 << 14)
    dirs = np.asarray(sc.direction)
    reflect_frac = (dirs[:, 2] > 0).mean()
    r0 = ((1 - 1 / 1.5) / (1 + 1 / 1.5)) ** 2
    np.testing.assert_allclose(reflect_frac, r0, atol=0.01)


def test_light_emits_and_terminates():
    scene = _scene_one_sphere(DiffuseLight(emit=Solid((4.0, 4.0, 4.0))))
    h, sc = _hit_and_scatter(scene)
    assert not bool(sc.alive.any())
    np.testing.assert_allclose(sc.emitted, 4.0, rtol=1e-6)
