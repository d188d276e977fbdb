"""Perlin noise tests vs a scalar NumPy oracle transcribed from
reference src/rtw/perlin.zig:47-91."""

import jax.numpy as jnp
import numpy as np

from rtweekend_tpu.utils import perlin


def oracle_noise(grad, px, py, pz, p):
    u, v, w = p - np.floor(p)
    i, j, k = int(np.floor(p[0])), int(np.floor(p[1])), int(np.floor(p[2]))
    uu = u * u * (3 - 2 * u)
    vv = v * v * (3 - 2 * v)
    ww = w * w * (3 - 2 * w)
    accum = 0.0
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                c = grad[px[(i + di) & 255] ^ py[(j + dj) & 255] ^ pz[(k + dk) & 255]]
                weight = np.array([u - di, v - dj, w - dk])
                accum += (
                    (di * uu + (1 - di) * (1 - uu))
                    * (dj * vv + (1 - dj) * (1 - vv))
                    * (dk * ww + (1 - dk) * (1 - ww))
                    * (c @ weight)
                )
    return accum


def oracle_turb(grad, px, py, pz, p, depth=7):
    accum, weight, q = 0.0, 1.0, p.copy()
    for _ in range(depth):
        accum += weight * oracle_noise(grad, px, py, pz, q)
        weight *= 0.5
        q = q * 2.0
    return abs(accum)


def test_tables_shape_and_norm():
    grad, px, py, pz = perlin.make_tables(42)
    assert grad.shape == (256, 3)
    np.testing.assert_allclose(np.linalg.norm(grad, axis=-1), 1.0, atol=1e-5)
    for t in (px, py, pz):
        assert sorted(t.tolist()) == list(range(256))


def test_noise_matches_oracle():
    grad, px, py, pz = perlin.make_tables(42, dtype=np.float64)
    pts = np.random.default_rng(3).uniform(-20, 20, size=(64, 3))
    got = np.asarray(
        perlin.noise(
            jnp.asarray(grad, jnp.float32),
            jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz),
            jnp.asarray(pts, jnp.float32),
        )
    )
    want = np.array([oracle_noise(grad, px, py, pz, p) for p in pts])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_noise_range_and_smoothness():
    grad, px, py, pz = perlin.make_tables(0)
    g = lambda p: perlin.noise(
        jnp.asarray(grad), jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz), p
    )
    pts = jnp.asarray(np.random.default_rng(4).uniform(-5, 5, (256, 3)), jnp.float32)
    vals = np.asarray(g(pts))
    assert (np.abs(vals) <= 1.0 + 1e-5).all()
    # noise is 0 at lattice points' gradient dot with zero weight only if
    # weight=0... instead check continuity: small perturbation -> small delta
    eps = 1e-3
    d = np.asarray(g(pts + eps)) - vals
    assert np.abs(d).max() < 0.05


def test_turb_matches_oracle():
    grad, px, py, pz = perlin.make_tables(42, dtype=np.float64)
    pts = np.random.default_rng(5).uniform(-3, 3, size=(16, 3))
    got = np.asarray(
        perlin.turb(
            jnp.asarray(grad, jnp.float32),
            jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz),
            jnp.asarray(pts, jnp.float32), 7,
        )
    )
    want = np.array([oracle_turb(grad, px, py, pz, p) for p in pts])
    np.testing.assert_allclose(got, want, atol=2e-3)
