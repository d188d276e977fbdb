"""Tone mapping and image I/O.

The reference tone-maps inline in the render loop (scale by 1/spp,
gamma-2 sqrt, clamp to [0, 0.999], quantize 256*c; src/main.zig:395-400)
and writes PNG via the zigimg native library (src/main.zig:405). Here the
tone map is a jnp op (fused into the render graph) and PNG encode runs
host-side; a P3 PPM writer is provided for BASELINE parity configs.
"""

from __future__ import annotations

import struct
import zlib

import jax.numpy as jnp
import numpy as np


def tonemap(accum, samples_per_pixel):
    """radiance-sum [H, W, 3] -> uint8 [H, W, 3].

    Exact formula of reference src/main.zig:395-400: mean over samples,
    gamma 2.0 via sqrt, clamp [0, 0.999], floor(256*c).
    """
    scale = 1.0 / samples_per_pixel
    c = jnp.sqrt(accum * scale)
    c = jnp.clip(c, 0.0, 0.999)
    return (256.0 * c).astype(jnp.uint8)


def tonemap_f(accum, samples_per_pixel):
    """Float variant of tonemap (pre-quantization), for losses/metrics."""
    scale = 1.0 / samples_per_pixel
    return jnp.clip(jnp.sqrt(accum * scale), 0.0, 0.999)


def write_ppm(path, pixels_u8):
    """Plain-text P3 PPM (BASELINE.json config 1 asks for PPM parity).
    Uses the native encoder (native/rtw_native.cpp) when built."""
    arr = np.asarray(pixels_u8)
    from rtweekend_tpu.utils import native

    data = native.ppm_encode(arr)
    if data is not None:
        with open(path, "wb") as f:
            f.write(data)
        return
    h, w, _ = arr.shape
    lines = [f"P3\n{w} {h}\n255\n"]
    flat = arr.reshape(-1, 3)
    lines.extend(f"{r} {g} {b}\n" for r, g, b in flat)
    with open(path, "w") as f:
        f.writelines(lines)


def write_png(path, pixels_u8):
    """PNG encode: native C++ encoder (native/rtw_native.cpp) when
    built, else Pillow, else a built-in minimal zlib encoder."""
    arr = np.ascontiguousarray(np.asarray(pixels_u8), dtype=np.uint8)
    from rtweekend_tpu.utils import native

    data = native.png_encode(arr)
    if data is not None:
        with open(path, "wb") as f:
            f.write(data)
        return
    try:
        from PIL import Image

        Image.fromarray(arr, mode="RGB").save(path, format="PNG")
    except ImportError:
        _write_png_minimal(path, arr)


def _png_chunk(tag, data):
    chunk = tag + data
    return struct.pack(">I", len(data)) + chunk + struct.pack(
        ">I", zlib.crc32(chunk) & 0xFFFFFFFF
    )


def _write_png_minimal(path, arr):
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(_png_chunk(b"IHDR", ihdr))
        f.write(_png_chunk(b"IDAT", zlib.compress(raw, 9)))
        f.write(_png_chunk(b"IEND", b""))


def read_image_rgba(path):
    """Decode an image file to uint8 RGBA [H, W, 4] (the reference decodes
    textures through zigimg, src/rtw/texture.zig:111)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGBA"), dtype=np.uint8)
