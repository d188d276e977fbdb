"""Procedural scene generators.

One builder per reference scene (reference src/main.zig:124-293), plus
the book-cover `final_scene` (the reference's generateRandomScene with
the book's 22x22 grid instead of its reduced 6x6 one — main.zig:177-180,
SURVEY.md quirks table — which is BASELINE.json config 4).

Scene-generation randomness: the reference threads its single serial
Xoshiro256++ stream through scene-gen (main.zig:181-215), so its random
scene depends on seed AND draw order. Cross-PRNG stream parity is
impossible (SURVEY.md §3.3); these builders replicate the *algorithm and
draw order* against a seeded numpy Generator, producing a fixed,
self-consistent scene.

Note scenes 1-5 do not even compile in the reference at this snapshot
(raw-pointer/Rc type mismatch, main.zig:26 vs hittable.zig:93; SURVEY.md
§4) — these builders implement their evident intent.
"""

from __future__ import annotations

import os

import numpy as np

from rtweekend_tpu.models.scene import (
    Checker,
    Dielectric,
    Diffuse,
    DiffuseLight,
    ImageTex,
    Metal,
    Noise,
    SceneBuilder,
    Solid,
)

EARTH_TEXTURE_PATH = os.environ.get(
    "RTW_EARTH_TEXTURE", "/root/reference/assets/sekaichizu.png"
)


def two_spheres(builder: SceneBuilder, rng: np.random.Generator):
    """generateTwoSpheres (main.zig:124-139)."""
    mat = builder.material(
        Diffuse(albedo=Checker(odd=(0.2, 0.3, 0.1), even=(0.9, 0.9, 0.9)))
    )
    builder.add_sphere((0.0, -10.0, 0.0), 10.0, mat)
    builder.add_sphere((0.0, 10.0, 0.0), 10.0, mat)


def two_perlin_spheres(builder: SceneBuilder, rng: np.random.Generator):
    """generateTwoPerlinSpheres (main.zig:141-155)."""
    mat = builder.material(Diffuse(albedo=Noise(scale=4.0)))
    builder.add_sphere((0.0, -1000.0, 0.0), 1000.0, mat)
    builder.add_sphere((0.0, 2.0, 0.0), 2.0, mat)


def _random_scene_grid(builder: SceneBuilder, rng: np.random.Generator, half: int,
                       checker_ground: bool = True, motion: bool = True):
    """Shared body of generateRandomScene (main.zig:157-221) with a
    configurable grid half-width (3 for the reference, 11 for the book).

    checker_ground=False / motion=False select the book-1 form of the
    scene — plain gray ground, static diffuse spheres — which is what
    the reference's committed golden render evidently used (it predates
    HEAD's book-2 edits; see parity.py)."""
    if checker_ground:
        ground_albedo = Checker(odd=(0.2, 0.3, 0.1), even=(0.9, 0.9, 0.9))
    else:
        ground_albedo = Solid((0.5, 0.5, 0.5))
    mat_ground = builder.material(Diffuse(albedo=ground_albedo))
    mat1 = builder.material(Dielectric(ir=1.5))
    mat2 = builder.material(Diffuse(albedo=Solid((0.4, 0.2, 0.1))))
    mat3 = builder.material(Metal(albedo=(0.7, 0.6, 0.5), fuzz=0.0))

    builder.add_sphere((0.0, -1000.0, 0.0), 1000.0, mat_ground)
    builder.add_sphere((0.0, 1.0, 0.0), 1.0, mat1)
    builder.add_sphere((-4.0, 1.0, 0.0), 1.0, mat2)
    builder.add_sphere((4.0, 1.0, 0.0), 1.0, mat3)

    for a in range(-half, half):
        for b in range(-half, half):
            choose_mat = rng.random()
            center = np.array(
                [a + 0.9 * rng.random(), 0.2, b + 0.9 * rng.random()]
            )
            # skip near the metal hero sphere (main.zig:188-190)
            if np.linalg.norm(center - np.array([4.0, 0.2, 0.0])) <= 0.9:
                continue
            if choose_mat < 0.8:
                # diffuse, moving upward (main.zig:193-205); book-1 form
                # is static
                albedo = rng.random(3) * rng.random(3)
                mat = builder.material(Diffuse(albedo=Solid(tuple(albedo))))
                if motion:
                    center1 = center + np.array(
                        [0.0, rng.uniform(0.0, 0.5), 0.0]
                    )
                    builder.add_moving_sphere(center, center1, 0.0, 1.0, 0.2, mat)
                else:
                    builder.add_sphere(center, 0.2, mat)
            elif choose_mat < 0.95:
                # metal (main.zig:206-211)
                albedo = rng.uniform(0.5, 1.0, 3)
                fuzz = rng.uniform(0.0, 0.5)
                mat = builder.material(Metal(albedo=tuple(albedo), fuzz=fuzz))
                builder.add_sphere(center, 0.2, mat)
            else:
                # glass (main.zig:212-216)
                mat = builder.material(Dielectric(ir=1.5))
                builder.add_sphere(center, 0.2, mat)


def random_scene(builder: SceneBuilder, rng: np.random.Generator):
    """generateRandomScene (main.zig:157-221): 6x6 grid."""
    _random_scene_grid(builder, rng, half=3)


def final_scene(builder: SceneBuilder, rng: np.random.Generator):
    """Book-cover scene: 22x22 grid (~485 spheres), BASELINE config 4."""
    _random_scene_grid(builder, rng, half=11)


def golden_scene(builder: SceneBuilder, rng: np.random.Generator):
    """The scene of the reference's committed golden render
    (RayTracingInOneWeekend.png): the book-1 final scene — plain gray
    ground, static diffuse spheres, 22x22 grid — under the book-1
    gradient sky (config.SCENE_DEFAULTS['golden_scene']['background']).
    The golden predates the reference HEAD's book-2 edits (checker
    ground + motion blur, main.zig:160-205), whose scenes 1-5 do not
    even compile at HEAD (SURVEY.md §4)."""
    _random_scene_grid(builder, rng, half=11, checker_ground=False,
                       motion=False)


def _procedural_earth_rgba(size=(256, 512)) -> np.ndarray:
    """Deterministic fallback world-map texture used when the reference
    asset is unavailable. Land cells are opaque, ocean cells have
    alpha 0 to exercise the alpha==0 -> ocean-blue path
    (reference texture.zig:138-140)."""
    h, w = size
    yy, xx = np.meshgrid(
        np.linspace(0, np.pi, h), np.linspace(0, 2 * np.pi, w), indexing="ij"
    )
    field = (
        np.sin(3 * xx) * np.sin(2 * yy)
        + 0.5 * np.sin(7 * xx + 1.3) * np.sin(5 * yy + 0.7)
        + 0.25 * np.sin(13 * xx + 2.1) * np.sin(11 * yy + 1.9)
    )
    land = field > 0.15
    rgba = np.zeros((h, w, 4), dtype=np.uint8)
    rgba[..., 0] = np.where(land, 60, 0)
    rgba[..., 1] = np.where(land, 160, 0)
    rgba[..., 2] = np.where(land, 70, 0)
    rgba[..., 3] = np.where(land, 255, 0)
    return rgba


def _load_earth_texture() -> np.ndarray:
    if os.path.exists(EARTH_TEXTURE_PATH):
        from rtweekend_tpu.utils.image import read_image_rgba

        return read_image_rgba(EARTH_TEXTURE_PATH)
    return _procedural_earth_rgba()


def earth(builder: SceneBuilder, rng: np.random.Generator):
    """generateEarthScene (main.zig:223-234)."""
    tex = ImageTex(data=_load_earth_texture())
    mat = builder.material(Diffuse(albedo=tex))
    builder.add_sphere((0.0, 0.0, 0.0), 2.0, mat)


def simple_light(builder: SceneBuilder, rng: np.random.Generator):
    """generateSimpleLightScene (main.zig:236-257)."""
    mat = builder.material(Diffuse(albedo=Noise(scale=4.0)))
    builder.add_sphere((0.0, -1000.0, 0.0), 1000.0, mat)
    builder.add_sphere((0.0, 2.0, 0.0), 2.0, mat)
    light = builder.material(DiffuseLight(emit=Solid((4.0, 4.0, 4.0))))
    builder.add_rect("xy", 3.0, 5.0, 1.0, 3.0, -2.0, light)


def cornell_box(builder: SceneBuilder, rng: np.random.Generator):
    """generateCornellBox (main.zig:259-293): the classic 555 box with
    two rotated/translated boxes; the reference's only live scene
    (const scene = 6, main.zig:310)."""
    red = builder.material(Diffuse(albedo=Solid((0.65, 0.05, 0.05))))
    white = builder.material(Diffuse(albedo=Solid((0.73, 0.73, 0.73))))
    green = builder.material(Diffuse(albedo=Solid((0.12, 0.45, 0.15))))
    light = builder.material(DiffuseLight(emit=Solid((15.0, 15.0, 15.0))))

    builder.add_rect("yz", 0.0, 555.0, 0.0, 555.0, 555.0, green)
    builder.add_rect("yz", 0.0, 555.0, 0.0, 555.0, 0.0, red)
    builder.add_rect("xz", 213.0, 343.0, 227.0, 332.0, 554.0, light)
    builder.add_rect("xz", 0.0, 555.0, 0.0, 555.0, 0.0, white)
    builder.add_rect("xz", 0.0, 555.0, 0.0, 555.0, 555.0, white)
    builder.add_rect("xy", 0.0, 555.0, 0.0, 555.0, 555.0, white)

    # box1: 165x330x165, rotY(+15 deg), translate(265, 0, 295)
    # (main.zig:284-286)
    builder.add_box(
        (0.0, 0.0, 0.0), (165.0, 330.0, 165.0), white,
        rot_y=np.radians(15.0), offset=(265.0, 0.0, 295.0),
    )
    # box2: 165^3, rotY(-18 deg), translate(130, 0, 65) (main.zig:288-290)
    builder.add_box(
        (0.0, 0.0, 0.0), (165.0, 165.0, 165.0), white,
        rot_y=np.radians(-18.0), offset=(130.0, 0.0, 65.0),
    )


def book1_diffuse(builder: SceneBuilder, rng: np.random.Generator):
    """Book-1 lambertian + ground (BASELINE config 1)."""
    ground = builder.material(Diffuse(albedo=Solid((0.5, 0.5, 0.5))))
    center = builder.material(Diffuse(albedo=Solid((0.5, 0.5, 0.5))))
    builder.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    builder.add_sphere((0.0, 0.0, -1.0), 0.5, center)


def book1_metal_dielectric(builder: SceneBuilder, rng: np.random.Generator):
    """Book-1 four-sphere scene with fuzz + hollow glass (config 2).

    The hollow glass uses a NEGATIVE-radius inner sphere: the quadratic
    is radius-sign-agnostic while the outward normal (p-c)/r flips,
    making the surface's inside face outward — handled natively by the
    SoA intersect (outward normal divides by the signed radius)."""
    ground = builder.material(Diffuse(albedo=Solid((0.8, 0.8, 0.0))))
    center = builder.material(Diffuse(albedo=Solid((0.1, 0.2, 0.5))))
    glass = builder.material(Dielectric(ir=1.5))
    metal = builder.material(Metal(albedo=(0.8, 0.6, 0.2), fuzz=0.3))
    builder.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    builder.add_sphere((0.0, 0.0, -1.0), 0.5, center)
    builder.add_sphere((-1.0, 0.0, -1.0), 0.5, glass)
    builder.add_sphere((-1.0, 0.0, -1.0), -0.45, glass)  # hollow shell
    builder.add_sphere((1.0, 0.0, -1.0), 0.5, metal)


SCENES = {
    "random_scene": random_scene,
    "book1_diffuse": book1_diffuse,
    "book1_metal_dielectric": book1_metal_dielectric,
    # config 3 reuses the 4-sphere world with the defocus camera
    # (camera params live in config.SCENE_DEFAULTS["book1_defocus"]).
    "book1_defocus": book1_metal_dielectric,
    "two_spheres": two_spheres,
    "two_perlin_spheres": two_perlin_spheres,
    "earth": earth,
    "simple_light": simple_light,
    "cornell_box": cornell_box,
    "final_scene": final_scene,
    "golden_scene": golden_scene,
}


def build_scene(name: str, seed: int = 42, dtype=None):
    """Build a Scene pytree by registry name (the reference's
    `const scene = N` selector, main.zig:310-362, as a runtime registry)."""
    import jax.numpy as jnp

    if name not in SCENES:
        raise KeyError(f"unknown scene {name!r}; have {sorted(SCENES)}")
    rng = np.random.default_rng(seed)
    builder = SceneBuilder(perlin_seed=seed)
    SCENES[name](builder, rng)
    return builder.build(dtype=dtype or jnp.float32)
