"""Native C++ runtime library: build + parity vs the Python paths."""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)


@pytest.fixture(scope="module")
def lib():
    subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)
    from rtweekend_tpu.utils import native

    native._tried = False
    native._lib = None
    assert native.available()
    return native


def test_native_tonemap_matches_jnp(lib):
    import jax.numpy as jnp

    from rtweekend_tpu.utils import image

    accum = np.random.default_rng(0).uniform(0, 8, (16, 16, 3)).astype(np.float32)
    want = np.asarray(image.tonemap(jnp.asarray(accum), 7))
    got = lib.tonemap(accum, 7)
    # sqrt rounding at quantization boundaries may differ by 1 ulp -> 1 level
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    assert (got == want).mean() > 0.99


def test_native_png_roundtrip(lib, tmp_path):
    from rtweekend_tpu.utils.image import read_image_rgba

    img = np.random.default_rng(1).integers(0, 255, (33, 57, 3), dtype=np.uint8)
    data = lib.png_encode(img)
    p = tmp_path / "n.png"
    p.write_bytes(data)
    back = read_image_rgba(str(p))
    np.testing.assert_array_equal(back[..., :3], img)


def test_native_ppm(lib):
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    txt = lib.ppm_encode(img).decode()
    vals = txt.split()
    assert vals[0] == "P3" and vals[1:4] == ["3", "2", "255"]
    np.testing.assert_array_equal(
        np.array(vals[4:], dtype=np.uint8).reshape(2, 3, 3), img
    )


def test_write_png_uses_native(lib, tmp_path):
    from rtweekend_tpu.utils import image
    from rtweekend_tpu.utils.image import read_image_rgba

    img = np.random.default_rng(2).integers(0, 255, (8, 8, 3), dtype=np.uint8)
    p = tmp_path / "w.png"
    image.write_png(str(p), img)
    back = read_image_rgba(str(p))
    np.testing.assert_array_equal(back[..., :3], img)
