"""Texture-table evaluation tests (reference src/rtw/texture.zig)."""

import jax.numpy as jnp
import numpy as np

from rtweekend_tpu.models.scene import (
    Checker,
    Diffuse,
    ImageTex,
    Noise,
    SceneBuilder,
    Solid,
)
from rtweekend_tpu.ops.textures import texture_value


def _scene_with(texture_desc):
    b = SceneBuilder()
    m = b.material(Diffuse(albedo=texture_desc))
    b.add_sphere((0, 0, 0), 1.0, m)
    scene = b.build()
    tid = scene.materials.tex_id[0]
    return scene, tid


def test_solid():
    scene, tid = _scene_with(Solid((0.1, 0.2, 0.3)))
    p = jnp.zeros((4, 3))
    out = texture_value(scene, jnp.full(4, tid), jnp.zeros(4), jnp.zeros(4), p)
    np.testing.assert_allclose(out, np.tile([0.1, 0.2, 0.3], (4, 1)), rtol=1e-6)


def test_checker_sign():
    # sines = sin(10x) sin(10y) sin(10z) < 0 -> odd (texture.zig:78-82)
    scene, tid = _scene_with(Checker(odd=(1, 0, 0), even=(0, 1, 0)))
    p = jnp.asarray([[0.05, 0.05, 0.05], [0.05, 0.05, -0.05]], jnp.float32)
    out = np.asarray(
        texture_value(scene, jnp.full(2, tid), jnp.zeros(2), jnp.zeros(2), p)
    )
    # first: product of three positive sines > 0 -> even (green);
    # second: one negative factor -> odd (red)
    np.testing.assert_allclose(out[0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [1, 0, 0], atol=1e-6)


def test_noise_formula():
    from rtweekend_tpu.utils import perlin as perlin_mod

    scene, tid = _scene_with(Noise(scale=4.0))
    pts = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (8, 3)), jnp.float32)
    out = np.asarray(
        texture_value(scene, jnp.full(8, tid), jnp.zeros(8), jnp.zeros(8), pts)
    )
    turb = np.asarray(
        perlin_mod.turb(
            scene.perlin_grad, scene.perlin_px, scene.perlin_py, scene.perlin_pz,
            pts, 7,
        )
    )
    want = 0.5 * (1.0 + np.sin(4.0 * np.asarray(pts)[:, 2] + 10.0 * turb))
    np.testing.assert_allclose(out, np.repeat(want[:, None], 3, 1), atol=1e-5)
    assert (out >= 0).all() and (out <= 1).all()


def test_image_lookup_and_ocean_alpha():
    img = np.zeros((4, 8, 4), dtype=np.uint8)
    img[0, 0] = [255, 0, 0, 255]     # top-left red
    img[3, 7] = [0, 255, 0, 255]     # bottom-right green
    img[1, 1] = [9, 9, 9, 0]         # transparent -> ocean blue
    scene, tid = _scene_with(ImageTex(data=img))
    # v=1 maps to image row 0 (flip, texture.zig:124-125); u=0 -> col 0
    u = jnp.asarray([0.0, 0.999, 1.0 / 8 + 0.01], jnp.float32)
    v = jnp.asarray([1.0, 0.0, 1.0 - (1.0 / 4 + 0.01)], jnp.float32)
    out = np.asarray(
        texture_value(scene, jnp.full(3, tid), u, v, jnp.zeros((3, 3)))
    )
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], [0, 0, 1], atol=1e-6)  # ocean hack
