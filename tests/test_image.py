"""Tone map + image I/O tests (reference src/main.zig:395-400 formula)."""

import os

import jax.numpy as jnp
import numpy as np

from rtweekend_tpu.utils import image


def test_tonemap_formula():
    # pixel sums for spp=4: value 1.0 mean -> sqrt(1.0)=1.0 -> clamp 0.999
    # -> 255; value 0.25 mean -> 0.5 -> 128
    accum = jnp.asarray([[[4.0, 1.0, 0.0]]])
    out = np.asarray(image.tonemap(accum, 4))
    assert out.shape == (1, 1, 3)
    assert out[0, 0, 0] == 255  # int(256*0.999) = 255
    assert out[0, 0, 1] == 128  # int(256*sqrt(0.25)) = 128
    assert out[0, 0, 2] == 0


def test_tonemap_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    accum = rng.uniform(0, 8, (4, 4, 3))
    spp = 7
    out = np.asarray(image.tonemap(jnp.asarray(accum, jnp.float32), spp))
    want = (256.0 * np.clip(np.sqrt(accum / spp), 0.0, 0.999)).astype(np.uint8)
    np.testing.assert_array_equal(out, want)


def test_ppm_roundtrip(tmp_path):
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    p = tmp_path / "t.ppm"
    image.write_ppm(str(p), img)
    txt = p.read_text().split()
    assert txt[0] == "P3" and txt[1:4] == ["3", "2", "255"]
    vals = np.array(txt[4:], dtype=np.uint8).reshape(2, 3, 3)
    np.testing.assert_array_equal(vals, img)


def test_png_roundtrip(tmp_path):
    img = np.random.default_rng(1).integers(0, 255, (5, 7, 3), dtype=np.uint8)
    p = tmp_path / "t.png"
    image.write_png(str(p), img)
    back = image.read_image_rgba(str(p))
    np.testing.assert_array_equal(back[..., :3], img)
    assert (back[..., 3] == 255).all()


def test_minimal_png_encoder(tmp_path):
    img = np.random.default_rng(2).integers(0, 255, (4, 4, 3), dtype=np.uint8)
    p = tmp_path / "m.png"
    image._write_png_minimal(str(p), np.ascontiguousarray(img))
    back = image.read_image_rgba(str(p))
    np.testing.assert_array_equal(back[..., :3], img)
