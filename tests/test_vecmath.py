"""Unit tests for batched vector math vs scalar NumPy oracles
(formulas transcribed from reference src/rtw/vec.zig and material.zig)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rtweekend_tpu.utils import vecmath

RNG = np.random.default_rng(0)


def test_dot_cross_norm():
    u = RNG.normal(size=(32, 3)).astype(np.float32)
    v = RNG.normal(size=(32, 3)).astype(np.float32)
    np.testing.assert_allclose(
        vecmath.dot(jnp.asarray(u), jnp.asarray(v)), (u * v).sum(-1), rtol=1e-5
    )
    np.testing.assert_allclose(
        vecmath.cross(jnp.asarray(u), jnp.asarray(v)), np.cross(u, v), rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        vecmath.norm(jnp.asarray(u)), np.linalg.norm(u, axis=-1), rtol=1e-5
    )


def test_normalized_zero_guard():
    # reference vec.zig:33-40: zero vector normalizes to itself.
    v = jnp.array([[0.0, 0.0, 0.0], [3.0, 0.0, 4.0]])
    out = vecmath.normalized(v)
    np.testing.assert_allclose(out[0], [0, 0, 0])
    np.testing.assert_allclose(out[1], [0.6, 0.0, 0.8], rtol=1e-6)


def test_near_zero():
    v = jnp.array([[1e-9, 1e-9, 1e-9], [1e-9, 1e-7, 1e-9]])
    np.testing.assert_array_equal(vecmath.near_zero(v), [True, False])


def test_reflect():
    # reflect(v, n) = v - 2 (v.n) n  (material.zig:112-114)
    v = np.array([[1.0, -1.0, 0.0]])
    n = np.array([[0.0, 1.0, 0.0]])
    out = vecmath.reflect(jnp.asarray(v), jnp.asarray(n))
    np.testing.assert_allclose(out, [[1.0, 1.0, 0.0]], atol=1e-7)


def test_refract_matches_oracle():
    # material.zig:116-121 oracle in float64.
    def oracle(uv, n, ratio):
        cos_theta = min(-(uv @ n), 1.0)
        perp = ratio * (uv + cos_theta * n)
        par = -np.sqrt(abs(1.0 - perp @ perp)) * n
        return perp + par

    rng = np.random.default_rng(1)
    for _ in range(20):
        d = rng.normal(size=3)
        d = d / np.linalg.norm(d)
        n = rng.normal(size=3)
        n = n / np.linalg.norm(n)
        if d @ n > 0:
            n = -n
        ratio = rng.uniform(0.4, 2.0)
        got = vecmath.refract(
            jnp.asarray(d[None], jnp.float32),
            jnp.asarray(n[None], jnp.float32),
            jnp.asarray([ratio], jnp.float32),
        )
        np.testing.assert_allclose(got[0], oracle(d, n, ratio), atol=1e-5)
