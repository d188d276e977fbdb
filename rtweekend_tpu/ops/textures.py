"""Branchless texture evaluation over ray batches.

Replaces the reference's Texture tagged-union dispatch
(reference src/rtw/texture.zig:36-43): all texture families present in
the scene are evaluated for every lane and selected by type id. Families
absent from the scene are skipped entirely at trace time via the Scene's
static has_* flags, so e.g. a Cornell render compiles no Perlin code.
"""

from __future__ import annotations

import jax.numpy as jnp

from rtweekend_tpu.models.scene import (
    Scene,
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_NOISE,
)
from rtweekend_tpu.utils import perlin as perlin_mod


def texture_value(scene: Scene, tex_id, u, v, p):
    """Color of texture `tex_id` at surface coords (u, v) and point p.

    tex_id: int32 [N]; u, v: [N]; p: [N, 3]. Returns [N, 3].
    """
    tx = scene.textures
    ttype = tx.ttype[tex_id]          # [N]
    color = tx.color[tex_id]          # [N, 3]
    out = color                       # solid (texture.zig:46-55)

    if scene.has_checker:
        # sines = sin(10x) sin(10y) sin(10z); odd if < 0
        # (texture.zig:78-82). Sub-textures are solids by construction.
        sines = (
            jnp.sin(10.0 * p[:, 0])
            * jnp.sin(10.0 * p[:, 1])
            * jnp.sin(10.0 * p[:, 2])
        )
        checker = jnp.where((sines < 0.0)[:, None], tx.color2[tex_id], color)
        out = jnp.where((ttype == TEX_CHECKER)[:, None], checker, out)

    if scene.has_noise:
        # 0.5 * (1 + sin(scale * z + 10 * turb(p, 7))) grayscale
        # (texture.zig:100-104).
        turbv = perlin_mod.turb(
            scene.perlin_grad,
            scene.perlin_px,
            scene.perlin_py,
            scene.perlin_pz,
            p,
            depth=7,
        )
        gray = 0.5 * (1.0 + jnp.sin(tx.scale[tex_id] * p[:, 2] + 10.0 * turbv))
        out = jnp.where((ttype == TEX_NOISE)[:, None], gray[:, None], out)

    if scene.has_image:
        # Nearest-neighbor image lookup (texture.zig:120-144). The
        # reference clamps j to width-1 — a bug (texture.zig:130, SURVEY
        # quirks table) we fix by clamping to height-1. The alpha==0 ->
        # ocean-blue hack (texture.zig:138-140) is replicated: it is
        # visible in the earth-scene golden image.
        img_id = tx.image_id[tex_id]            # [N]
        w = scene.image_w[img_id].astype(u.dtype)
        h = scene.image_h[img_id].astype(u.dtype)
        uu = jnp.clip(u, 0.0, 1.0)
        vv = 1.0 - jnp.clip(v, 0.0, 1.0)
        i = jnp.minimum((uu * w).astype(jnp.int32), scene.image_w[img_id] - 1)
        j = jnp.minimum((vv * h).astype(jnp.int32), scene.image_h[img_id] - 1)
        texel = scene.images[img_id, j, i].astype(u.dtype)  # [N, 4]
        rgb = texel[:, :3] / 255.0
        ocean = jnp.array([0.0, 0.0, 1.0], dtype=u.dtype)
        img_col = jnp.where((texel[:, 3] == 0.0)[:, None], ocean[None, :], rgb)
        out = jnp.where((ttype == TEX_IMAGE)[:, None], img_col, out)

    return out
