"""Golden-render regression tests.

The reference's only verification artifact is its committed render
(SURVEY.md §4). Here: every scene renders a tiny fixed-seed image; the
radiance framebuffer is compared against a stored golden. A missing
golden FAILS — re-baseline intentionally with `pytest --bless` after an
algorithm change (auto-creation would silently re-baseline if a golden
were deleted alongside a regression).
"""

import os

import numpy as np
import pytest

from rtweekend_tpu.config import SCENE_DEFAULTS
from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.render import camera_for_scene, render

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
W = H = 24
SPP = 4
DEPTH = 6


def _render(name):
    scene = build_scene(name, seed=42)
    camera = camera_for_scene(name, aspect_ratio=1.0)
    bg = SCENE_DEFAULTS[name]["background"]
    return np.asarray(
        render(scene, camera, W, H, SPP, DEPTH, bg, 42, rays_per_chunk=1 << 30)
    )


@pytest.mark.parametrize("name", sorted(SCENE_DEFAULTS))
def test_scene_golden(name, bless):
    fb = _render(name)
    assert np.isfinite(fb).all()
    assert fb.min() >= 0.0
    path = os.path.join(GOLDEN_DIR, f"{name}_{W}x{H}_{SPP}spp_{DEPTH}d.npy")
    if bless or not os.path.exists(path):
        assert bless, (
            f"golden missing: {path} — run `pytest --bless` to create it"
        )
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, fb)
        pytest.skip(f"golden blessed: {path}")
    want = np.load(path)
    np.testing.assert_allclose(fb, want, rtol=1e-4, atol=1e-4)


def test_cornell_light_visible():
    """The ceiling light must be the brightest region (scene semantics,
    reference main.zig:272-277)."""
    fb = _render("cornell_box") / SPP
    top = fb[: H // 3].mean()
    assert fb.max() > 1.0  # emitter radiance 15 clipped by few hits
    assert top >= fb[2 * H // 3 :].mean() * 0.5  # light is up top


def test_sky_scenes_background_dominant():
    fb = _render("two_spheres") / SPP
    # blue-sky background: blue channel strongest on average
    means = fb.mean(axis=(0, 1))
    assert means[2] >= means[0]
