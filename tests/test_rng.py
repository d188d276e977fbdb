"""Statistical tests for the counter-based samplers: the fixed-count
transforms must match the distributions of the reference's rejection
loops (reference src/rtw/rand.zig:22-40)."""

import jax.numpy as jnp
import numpy as np

from rtweekend_tpu.utils import rng as rng_mod

N = 1 << 15
PIX = jnp.arange(N, dtype=jnp.int32)
SMP = jnp.zeros(N, jnp.int32)
SEED = jnp.uint32(7)


def test_uniform4_range_and_mean():
    u = np.asarray(rng_mod.uniform4(SEED, PIX, SMP, 3))
    assert u.shape == (N, 4)
    assert (u >= 0).all() and (u < 1).all()
    np.testing.assert_allclose(u.mean(axis=0), 0.5, atol=0.01)
    np.testing.assert_allclose(u.var(axis=0), 1 / 12, atol=0.01)


def test_streams_decorrelated():
    a = np.asarray(rng_mod.uniform4(SEED, PIX, SMP, 1))[:, 0]
    b = np.asarray(rng_mod.uniform4(SEED, PIX, SMP, 2))[:, 0]
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.02


def test_determinism_and_seed_sensitivity():
    a = np.asarray(rng_mod.uniform4(SEED, PIX, SMP, 5))
    b = np.asarray(rng_mod.uniform4(SEED, PIX, SMP, 5))
    c = np.asarray(rng_mod.uniform4(jnp.uint32(8), PIX, SMP, 5))
    np.testing.assert_array_equal(a, b)
    assert (a != c).mean() > 0.99


def test_unit_vector_isotropic():
    v = np.asarray(rng_mod.unit_vector(SEED, PIX, SMP, 11))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # each component has mean 0, var 1/3 on the sphere
    np.testing.assert_allclose(v.mean(axis=0), 0.0, atol=0.02)
    np.testing.assert_allclose(v.var(axis=0), 1 / 3, atol=0.02)


def test_in_unit_sphere_radial_cdf():
    u = rng_mod.uniform4(SEED, PIX, SMP, 12)
    p = np.asarray(rng_mod.in_unit_sphere(SEED, PIX, SMP, 13, u[:, 0]))
    r = np.linalg.norm(p, axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    # P(r < x) = x^3 for the uniform ball
    for x in (0.3, 0.6, 0.9):
        np.testing.assert_allclose((r < x).mean(), x**3, atol=0.02)


def test_in_unit_disk():
    u = np.asarray(rng_mod.uniform4(SEED, PIX, SMP, 14))
    p = np.asarray(rng_mod.in_unit_disk_from_u(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])))
    r = np.linalg.norm(p[:, :2], axis=-1)
    assert (p[:, 2] == 0).all()
    assert (r <= 1.0 + 1e-6).all()
    # P(r < x) = x^2 for the uniform disk
    for x in (0.3, 0.6, 0.9):
        np.testing.assert_allclose((r < x).mean(), x**2, atol=0.02)


def test_gauss_moments():
    u = rng_mod.uniform4(SEED, PIX, SMP, 15)
    g = np.asarray(rng_mod.gauss4_from_u4(u, jnp.dtype(jnp.float32)))
    np.testing.assert_allclose(g.mean(axis=0), 0.0, atol=0.03)
    np.testing.assert_allclose(g.var(axis=0), 1.0, atol=0.05)
