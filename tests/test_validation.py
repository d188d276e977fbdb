"""Build-time validation and sanitizer modes (SURVEY.md §5)."""

import numpy as np
import pytest

from rtweekend_tpu.config import SCENE_DEFAULTS
from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.models.scene import Metal, SceneBuilder
from rtweekend_tpu.render import camera_for_scene, render


def test_metal_fuzz_validated():
    """The reference asserts fuzz <= 1 (material.zig:60); the builder
    rejects out-of-range fuzz instead of silently accepting it."""
    b = SceneBuilder()
    b.material(Metal(albedo=(0.5, 0.5, 0.5), fuzz=1.0))  # boundary OK
    with pytest.raises(ValueError, match="fuzz"):
        b.material(Metal(albedo=(0.5, 0.5, 0.5), fuzz=1.5))
    with pytest.raises(ValueError, match="fuzz"):
        b.material(Metal(albedo=(0.5, 0.5, 0.5), fuzz=-0.1))


@pytest.mark.parametrize("name", ["cornell_box", "final_scene", "earth"])
def test_render_nan_free_under_debug_nans(name, debug_nans):
    """jax_debug_nans sanitizer render: any NaN produced anywhere in the
    traced render graph raises immediately. Guards the zero-norm /
    degenerate-quadratic edge cases (SURVEY.md §7 hard parts)."""
    scene = build_scene(name, seed=42)
    camera = camera_for_scene(name, aspect_ratio=1.0)
    bg = SCENE_DEFAULTS[name]["background"]
    fb = render(scene, camera, 12, 12, 2, 4, bg, 42, use_pallas=False)
    assert np.isfinite(np.asarray(fb)).all()
