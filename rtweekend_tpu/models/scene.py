"""SoA scene representation and host-side scene builder.

The reference models a scene as a recursive tagged union of heap-allocated
hittables with ref-counted shared materials (reference src/rtw/hittable.zig:22-88,
src/rc.zig). That design cannot map to a TPU: pointer chasing, dynamic
dispatch, and per-object recursion defeat XLA. Here the scene is a value-type
pytree of padded SoA arrays:

- Spheres: static and moving spheres unified (a static sphere is a moving
  sphere with zero center delta), per reference hittable.zig:90-226.
- Rects: the three axis-aligned rect families (hittable.zig:270-427) unified
  into one record by baking each rect's object-space axes, rotate-Y and
  translate instancing (hittable.zig:472-608), and box decomposition
  (hittable.zig:429-470 -> 6 rects) into per-rect affine projection rows:
      object_coord_q(p) = w_q . p + b_q      (q in {normal, u, v})
  so the whole intersection test becomes ray-batch matmuls + elementwise
  VPU work — no per-object control flow at all.
- Materials / Textures: flat parameter tables indexed by integer ids; the
  Rc-shared-material pattern becomes plain index sharing.

Everything float is differentiable (sphere centers/radii, albedo colors,
fuzz, ior, emission); everything structural is int32/bool metadata.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from rtweekend_tpu.utils import perlin as perlin_mod

# Material type codes (reference src/rtw/material.zig:16-21).
MAT_DIFFUSE = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2
MAT_LIGHT = 3

# Texture type codes (reference src/rtw/texture.zig:10-15).
TEX_SOLID = 0
TEX_CHECKER = 1
TEX_NOISE = 2
TEX_IMAGE = 3

# Rect axis families: (normal_axis, u_axis, v_axis) in object space.
# xyRect solves t against z=k and spans (x, y)  (hittable.zig:270-314)
# xzRect: y=k spanning (x, z)                   (hittable.zig:316-368)
# yzRect: x=k spanning (y, z)                   (hittable.zig:370-427)
RECT_AXES = {
    "xy": (2, 0, 1),
    "xz": (1, 0, 2),
    "yz": (0, 1, 2),
}


def _register(cls, meta_fields=()):
    fields = [f.name for f in dataclasses.fields(cls)]
    data_fields = [f for f in fields if f not in meta_fields]
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=list(meta_fields)
    )
    return cls


@dataclasses.dataclass
class Spheres:
    """Unified static + moving spheres, padded SoA.

    center(t) = c0 + dc * (t - time0) * inv_dt   (hittable.zig:219-221);
    static spheres have dc = 0.
    """

    c0: jax.Array        # [S, 3]
    dc: jax.Array        # [S, 3] = center1 - center0
    time0: jax.Array     # [S]
    inv_dt: jax.Array    # [S] = 1 / (time1 - time0)
    radius: jax.Array    # [S]
    mat_id: jax.Array    # [S] int32
    active: jax.Array    # [S] bool (False for padding)


_register(Spheres)


@dataclasses.dataclass
class Rects:
    """Axis-aligned rects with baked instance transforms, padded SoA.

    For each rect, object-space coordinates of a world point p are
    affine:  q(p) = w_q . p + b_q  for q in (n, a, b); directions use the
    linear part only. `normal` is the object-space outward normal mapped
    to world space (reference RotateY.hit back-rotation,
    hittable.zig:584-590). k is the plane offset and [a0,a1]x[b0,b1] the
    in-plane bounds (hittable.zig:270-427).
    """

    wn: jax.Array       # [R, 3]
    bn: jax.Array       # [R]
    wa: jax.Array       # [R, 3]
    ba: jax.Array       # [R]
    wb: jax.Array       # [R, 3]
    bb: jax.Array       # [R]
    k: jax.Array        # [R]
    a0: jax.Array       # [R]
    a1: jax.Array       # [R]
    b0: jax.Array       # [R]
    b1: jax.Array       # [R]
    normal: jax.Array   # [R, 3] world-space outward normal
    mat_id: jax.Array   # [R] int32
    active: jax.Array   # [R] bool


_register(Rects)


@dataclasses.dataclass
class Materials:
    """Flat material table (reference src/rtw/material.zig:16-39).

    mtype selects the scatter branch; tex_id points at the albedo texture
    (diffuse), the solid albedo (metal), or the emission texture (light);
    fuzz and ior are the metal/dielectric scalars.
    """

    mtype: jax.Array    # [M] int32
    tex_id: jax.Array   # [M] int32
    fuzz: jax.Array     # [M]
    ior: jax.Array      # [M]


_register(Materials)


@dataclasses.dataclass
class Textures:
    """Flat texture table (reference src/rtw/texture.zig:10-44).

    color/color2 are (solid color) or (checker even/odd solid
    sub-colors); scale is the noise frequency; image_id indexes the image
    atlas. Checker sub-textures are restricted to solids — the only form
    the reference ever constructs (Texture.makeChecker, texture.zig:20-27).
    """

    ttype: jax.Array     # [K] int32
    color: jax.Array     # [K, 3] solid color / checker even
    color2: jax.Array    # [K, 3] checker odd
    scale: jax.Array     # [K] noise scale
    image_id: jax.Array  # [K] int32


_register(Textures)


@dataclasses.dataclass
class Scene:
    spheres: Spheres
    rects: Rects
    materials: Materials
    textures: Textures
    # Perlin tables (reference src/rtw/perlin.zig:10-38), generated once.
    perlin_grad: jax.Array  # [256, 3]
    perlin_px: jax.Array    # [256] int32
    perlin_py: jax.Array    # [256] int32
    perlin_pz: jax.Array    # [256] int32
    # Image atlas: [n_img, H, W, 4] uint8 (+ per-image true dims), padded.
    images: jax.Array       # uint8
    image_h: jax.Array      # [n_img] int32
    image_w: jax.Array      # [n_img] int32
    # Kernel-layout image data: every image flattened row-major at its
    # TRUE width, RGBA packed into one int32 (r | g<<8 | b<<16 | a<<24),
    # all images concatenated and reshaped to [C, 128] — the Pallas
    # megakernel gathers texels from 128-lane rows (Mosaic supports
    # dynamic lane gathers only). image_base is each image's first texel
    # offset into the flat array.
    images_packed: jax.Array  # [C, 128] int32
    image_base: jax.Array     # [n_img] int32
    # --- static metadata (part of the treedef; retraces per scene shape) ---
    n_spheres: int = 0
    n_rects: int = 0
    has_checker: bool = False
    has_noise: bool = False
    has_image: bool = False
    has_motion: bool = False


_register(
    Scene,
    meta_fields=(
        "n_spheres",
        "n_rects",
        "has_checker",
        "has_noise",
        "has_image",
        "has_motion",
    ),
)


# ---------------------------------------------------------------------------
# Host-side description types consumed by SceneBuilder.


@dataclasses.dataclass(frozen=True)
class Solid:
    color: Tuple[float, float, float]


@dataclasses.dataclass(frozen=True)
class Checker:
    odd: Tuple[float, float, float]
    even: Tuple[float, float, float]


@dataclasses.dataclass(frozen=True)
class Noise:
    scale: float


@dataclasses.dataclass(frozen=True)
class ImageTex:
    # uint8 RGBA array; hashed by identity for dedup.
    data: "np.ndarray"

    def __hash__(self):
        return id(self.data)

    def __eq__(self, other):
        return isinstance(other, ImageTex) and other.data is self.data


TextureDesc = Union[Solid, Checker, Noise, ImageTex]


@dataclasses.dataclass(frozen=True)
class Diffuse:
    albedo: TextureDesc


@dataclasses.dataclass(frozen=True)
class Metal:
    albedo: Tuple[float, float, float]
    fuzz: float


@dataclasses.dataclass(frozen=True)
class Dielectric:
    ir: float


@dataclasses.dataclass(frozen=True)
class DiffuseLight:
    emit: TextureDesc


MaterialDesc = Union[Diffuse, Metal, Dielectric, DiffuseLight]


def _pad_to(n: int, multiple: int = 8) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


class SceneBuilder:
    """Accumulates primitives host-side, freezes to a padded Scene pytree.

    Plays the role of the reference's scene generator functions plus the
    Hittable constructors (makeBox/makeTranslate/makeRotateY,
    hittable.zig:35-45): boxes are decomposed into 6 rects and instance
    transforms are baked into per-rect affine rows at build time.
    """

    def __init__(self, perlin_seed: int = 42):
        self._textures: list[TextureDesc] = []
        self._materials: list[MaterialDesc] = []
        self._spheres: list[tuple] = []
        self._rects: list[tuple] = []
        self._images: list[np.ndarray] = []
        self._tex_index: dict = {}
        self._mat_index: dict = {}
        self._img_index: dict = {}
        self.perlin_seed = perlin_seed

    # -- registries ---------------------------------------------------------

    def texture(self, desc: TextureDesc) -> int:
        if desc in self._tex_index:
            return self._tex_index[desc]
        if isinstance(desc, ImageTex) and id(desc.data) not in self._img_index:
            self._img_index[id(desc.data)] = len(self._images)
            self._images.append(np.asarray(desc.data, dtype=np.uint8))
        tid = len(self._textures)
        self._textures.append(desc)
        self._tex_index[desc] = tid
        return tid

    def material(self, desc: MaterialDesc) -> int:
        if desc in self._mat_index:
            return self._mat_index[desc]
        if isinstance(desc, Metal) and not 0.0 <= desc.fuzz <= 1.0:
            # the reference asserts fuzz <= 1 (material.zig:60); validate
            # at build time rather than silently accepting garbage
            raise ValueError(f"metal fuzz must be in [0, 1], got {desc.fuzz}")
        # Auto-register referenced textures (the reference shares textures
        # through heap pointers; here sharing is index dedup).
        if isinstance(desc, Diffuse):
            self.texture(desc.albedo)
        elif isinstance(desc, DiffuseLight):
            self.texture(desc.emit)
        mid = len(self._materials)
        self._materials.append(desc)
        self._mat_index[desc] = mid
        return mid

    # -- primitives ---------------------------------------------------------

    def add_sphere(self, center, radius: float, mat_id: int):
        """Static sphere (reference hittable.zig:90-155)."""
        self._spheres.append((tuple(center), tuple(center), 0.0, 1.0, radius, mat_id))

    def add_moving_sphere(
        self, center0, center1, time0: float, time1: float, radius: float, mat_id: int
    ):
        """Linearly moving sphere (reference hittable.zig:157-226)."""
        self._spheres.append(
            (tuple(center0), tuple(center1), time0, time1, radius, mat_id)
        )

    def add_rect(
        self,
        family: str,
        a0: float,
        a1: float,
        b0: float,
        b1: float,
        k: float,
        mat_id: int,
        rot_y: float = 0.0,
        offset=(0.0, 0.0, 0.0),
    ):
        """Axis-aligned rect, optionally instanced.

        family in {"xy", "xz", "yz"}; rot_y (radians) and offset bake the
        reference's RotateY/Translate wrappers (hittable.zig:472-608):
        the world->object map is rotate_y(-rot_y) o translate(-offset)
        applied as translate first, matching Translate wrapping RotateY
        in generateCornellBox (main.zig:284-290).
        """
        n_ax, a_ax, b_ax = RECT_AXES[family]
        c, s = math.cos(rot_y), math.sin(rot_y)
        # world->object rotation rows (reference RotateY.hit,
        # hittable.zig:563-567: x' = c*x - s*z ; z' = s*x + c*z).
        rw2o = np.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]])
        off = np.asarray(offset, dtype=np.float64)
        rows = []
        for ax in (n_ax, a_ax, b_ax):
            w = rw2o[ax]
            rows.append((w, -float(w @ off)))
        # object->world normal (hittable.zig:584-590) = Rw2o^T @ e_n.
        e_n = np.zeros(3)
        e_n[n_ax] = 1.0
        normal_world = rw2o.T @ e_n
        self._rects.append((rows, float(k), a0, a1, b0, b1, normal_world, mat_id))

    def add_box(
        self, p0, p1, mat_id: int, rot_y: float = 0.0, offset=(0.0, 0.0, 0.0)
    ):
        """Box as 6 rects sharing one material (reference Box.init,
        hittable.zig:434-451), with the instance transform baked in."""
        x0, y0, z0 = p0
        x1, y1, z1 = p1
        kw = dict(rot_y=rot_y, offset=offset)
        self.add_rect("xy", x0, x1, y0, y1, z1, mat_id, **kw)
        self.add_rect("xy", x0, x1, y0, y1, z0, mat_id, **kw)
        self.add_rect("xz", x0, x1, z0, z1, y1, mat_id, **kw)
        self.add_rect("xz", x0, x1, z0, z1, y0, mat_id, **kw)
        self.add_rect("yz", y0, y1, z0, z1, x1, mat_id, **kw)
        self.add_rect("yz", y0, y1, z0, z1, x0, mat_id, **kw)

    # -- freeze -------------------------------------------------------------

    def build(self, dtype=jnp.float32) -> Scene:
        # dtype conversion on the HOST (numpy), then a conversion-free
        # device_put: jnp.asarray with a converting dtype compiles an
        # eager convert_element_type per call, and on the remote-TPU
        # runtime every eager compile is a ~0.4 s round trip.
        _np_dtype = np.dtype(jnp.dtype(dtype).name)
        f = lambda x: jnp.asarray(np.asarray(x, dtype=_np_dtype))
        i32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.int32))

        ns, nr = len(self._spheres), len(self._rects)
        ps, pr = _pad_to(ns), _pad_to(nr)

        # Spheres; padding entries are inactive and pushed far away so even
        # unmasked math stays finite.
        c0 = np.zeros((ps, 3)); c1 = np.zeros((ps, 3))
        t0 = np.zeros(ps); t1 = np.ones(ps)
        rad = np.ones(ps); smat = np.zeros(ps, dtype=np.int32)
        sact = np.zeros(ps, dtype=bool)
        c0[:, 1] = c1[:, 1] = 1e9
        for idx, (a, b, u0, u1, r, m) in enumerate(self._spheres):
            c0[idx] = a; c1[idx] = b
            t0[idx] = u0; t1[idx] = u1 if u1 != u0 else u0 + 1.0
            rad[idx] = r; smat[idx] = m; sact[idx] = True

        spheres = Spheres(
            c0=f(c0), dc=f(c1 - c0), time0=f(t0), inv_dt=f(1.0 / (t1 - t0)),
            radius=f(rad), mat_id=i32(smat), active=jnp.asarray(sact),
        )

        # Rects; padding entries get degenerate bounds so they never hit.
        wn = np.zeros((pr, 3)); wn[:, 2] = 1.0
        bn = np.zeros(pr); wa = np.zeros((pr, 3)); wa[:, 0] = 1.0
        ba = np.zeros(pr); wb = np.zeros((pr, 3)); wb[:, 1] = 1.0
        bb = np.zeros(pr)
        k = np.full(pr, 1e9); ra0 = np.zeros(pr); ra1 = np.full(pr, -1.0)
        rb0 = np.zeros(pr); rb1 = np.full(pr, -1.0)
        nrm = np.zeros((pr, 3)); nrm[:, 2] = 1.0
        rmat = np.zeros(pr, dtype=np.int32); ract = np.zeros(pr, dtype=bool)
        for idx, (rows, kk, a0, a1, b0, b1, n_w, m) in enumerate(self._rects):
            (w0, b0_), (w1, b1_), (w2, b2_) = rows
            wn[idx], bn[idx] = w0, b0_
            wa[idx], ba[idx] = w1, b1_
            wb[idx], bb[idx] = w2, b2_
            k[idx] = kk; ra0[idx] = a0; ra1[idx] = a1
            rb0[idx] = b0; rb1[idx] = b1
            nrm[idx] = n_w; rmat[idx] = m; ract[idx] = True

        rects = Rects(
            wn=f(wn), bn=f(bn), wa=f(wa), ba=f(ba), wb=f(wb), bb=f(bb),
            k=f(k), a0=f(ra0), a1=f(ra1), b0=f(rb0), b1=f(rb1),
            normal=f(nrm), mat_id=i32(rmat), active=jnp.asarray(ract),
        )

        # Materials / textures.
        nm = max(1, len(self._materials))
        mtype = np.zeros(nm, dtype=np.int32); mtex = np.zeros(nm, dtype=np.int32)
        fuzz = np.zeros(nm); ior = np.ones(nm)
        tex_descs = list(self._textures)

        def solid_id(color):
            d = Solid(tuple(float(x) for x in color))
            if d in self._tex_index:
                return self._tex_index[d]
            tid = len(tex_descs)
            tex_descs.append(d)
            self._tex_index[d] = tid
            return tid

        for idx, m in enumerate(self._materials):
            if isinstance(m, Diffuse):
                mtype[idx] = MAT_DIFFUSE
                mtex[idx] = self._tex_index[m.albedo]
            elif isinstance(m, Metal):
                mtype[idx] = MAT_METAL
                mtex[idx] = solid_id(m.albedo)
                fuzz[idx] = m.fuzz
            elif isinstance(m, Dielectric):
                mtype[idx] = MAT_DIELECTRIC
                ior[idx] = m.ir
            elif isinstance(m, DiffuseLight):
                mtype[idx] = MAT_LIGHT
                mtex[idx] = self._tex_index[m.emit]
            else:
                raise TypeError(m)

        materials = Materials(mtype=i32(mtype), tex_id=i32(mtex), fuzz=f(fuzz), ior=f(ior))

        nt = max(1, len(tex_descs))
        ttype = np.zeros(nt, dtype=np.int32)
        color = np.ones((nt, 3)); color2 = np.zeros((nt, 3))
        scale = np.ones(nt); image_id = np.zeros(nt, dtype=np.int32)
        for idx, t in enumerate(tex_descs):
            if isinstance(t, Solid):
                ttype[idx] = TEX_SOLID; color[idx] = t.color
            elif isinstance(t, Checker):
                ttype[idx] = TEX_CHECKER
                color[idx] = t.even; color2[idx] = t.odd
            elif isinstance(t, Noise):
                ttype[idx] = TEX_NOISE; scale[idx] = t.scale
            elif isinstance(t, ImageTex):
                ttype[idx] = TEX_IMAGE
                image_id[idx] = self._img_index[id(t.data)]
            else:
                raise TypeError(t)

        textures = Textures(
            ttype=i32(ttype), color=f(color), color2=f(color2),
            scale=f(scale), image_id=i32(image_id),
        )

        # Image atlas, padded to common dims.
        if self._images:
            hmax = max(im.shape[0] for im in self._images)
            wmax = max(im.shape[1] for im in self._images)
            atlas = np.zeros((len(self._images), hmax, wmax, 4), dtype=np.uint8)
            ih = np.zeros(len(self._images), dtype=np.int32)
            iw = np.zeros(len(self._images), dtype=np.int32)
            for idx, im in enumerate(self._images):
                atlas[idx, : im.shape[0], : im.shape[1]] = im
                ih[idx], iw[idx] = im.shape[0], im.shape[1]
        else:
            atlas = np.zeros((1, 1, 1, 4), dtype=np.uint8)
            ih = np.ones(1, dtype=np.int32)
            iw = np.ones(1, dtype=np.int32)

        # Kernel-layout packed image planes (see Scene.images_packed).
        flats = []
        base = np.zeros(max(1, len(self._images)), dtype=np.int32)
        off = 0
        for idx, im in enumerate(self._images):
            u32 = im.astype(np.uint32)
            packed = (
                u32[..., 0]
                | (u32[..., 1] << 8)
                | (u32[..., 2] << 16)
                | (u32[..., 3] << 24)
            ).reshape(-1)
            base[idx] = off
            off += packed.size
            flats.append(packed)
        flat = (
            np.concatenate(flats) if flats else np.zeros(1, dtype=np.uint32)
        )
        pad = (-flat.size) % 128
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint32)])
        images_packed = flat.view(np.int32).reshape(-1, 128)

        np_dtype = np.dtype(jnp.dtype(dtype).name)
        grad, px, py, pz = perlin_mod.make_tables(self.perlin_seed, np_dtype)

        return Scene(
            spheres=spheres,
            rects=rects,
            materials=materials,
            textures=textures,
            perlin_grad=jnp.asarray(grad),
            perlin_px=jnp.asarray(px),
            perlin_py=jnp.asarray(py),
            perlin_pz=jnp.asarray(pz),
            images=jnp.asarray(atlas),
            image_h=jnp.asarray(ih),
            image_w=jnp.asarray(iw),
            images_packed=jnp.asarray(images_packed),
            image_base=jnp.asarray(base),
            n_spheres=ns,
            n_rects=nr,
            has_checker=any(isinstance(t, Checker) for t in tex_descs),
            has_noise=any(isinstance(t, Noise) for t in tex_descs),
            has_image=any(isinstance(t, ImageTex) for t in tex_descs),
            has_motion=any(
                tuple(s[0]) != tuple(s[1]) for s in self._spheres
            ),
        )
