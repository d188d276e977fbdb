"""float64 parity mode (SURVEY.md §4: f64-oracle checks).

The TPU-native default is f32; f64 exists as a high-precision oracle
for validating the f32 path. These tests verify dtype honesty end to
end (no silent downcast) and that the f32 render agrees with the f64
oracle within single-precision accumulation error.
"""

import jax
import numpy as np
import pytest

from rtweekend_tpu.config import SCENE_DEFAULTS
from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.render import camera_for_scene, render


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def _render(name, dtype, w=16, h=16, spp=4, depth=5):
    import jax.numpy as jnp

    scene = build_scene(name, seed=42, dtype=jnp.dtype(dtype))
    camera = camera_for_scene(name, dtype=jnp.dtype(dtype), aspect_ratio=1.0)
    bg = SCENE_DEFAULTS[name]["background"]
    fb = render(
        scene, camera, w, h, spp, depth, bg, 42,
        dtype=jnp.dtype(dtype), use_pallas=False,
    )
    return fb


def test_f64_dtype_end_to_end(x64):
    fb = _render("cornell_box", "float64")
    assert fb.dtype == np.float64  # no silent downcast anywhere
    arr = np.asarray(fb)
    assert np.isfinite(arr).all()
    assert arr.max() > 0.0


def test_f32_matches_f64_oracle(x64):
    """f32 vs f64 on the same key sequence: identical path decisions for
    nearly all rays, so per-pixel radiance agrees to f32 accuracy except
    where a discrete choice (closest root, Schlick Bernoulli) flips.
    Bound the flip fraction and the mean drift."""
    f64 = np.asarray(_render("cornell_box", "float64"))
    jax.config.update("jax_enable_x64", False)
    f32 = np.asarray(_render("cornell_box", "float32")).astype(np.float64)
    diff = np.abs(f32 - f64)
    assert (diff > 1e-3).mean() < 0.02, f"diverged: {(diff > 1e-3).mean()}"
    np.testing.assert_allclose(f32.mean(), f64.mean(), rtol=5e-3)
