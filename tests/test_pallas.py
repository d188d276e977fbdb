"""Pallas megakernel parity vs the jnp integrator (interpret mode on
CPU — same kernel code path Mosaic compiles on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rtweekend_tpu.config import SCENE_DEFAULTS
from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.models.scene import (
    Dielectric,
    Diffuse,
    DiffuseLight,
    Metal,
    SceneBuilder,
    Solid,
)
from rtweekend_tpu.ops.camera import generate_rays
from rtweekend_tpu.ops.integrator import trace_paths
from rtweekend_tpu.ops.pallas.megakernel import (
    trace_paths_pallas,
    trace_paths_pallas_compact,
)
from rtweekend_tpu.render import camera_for_scene

SEED = jnp.uint32(42)


def _parity(scene, cam_name, bg, n=1024, depth=6, aspect=1.0):
    cam = camera_for_scene(cam_name, aspect_ratio=aspect)
    pid = jnp.arange(n, dtype=jnp.int32) % (32 * 32)
    sid = jnp.arange(n, dtype=jnp.int32) // (32 * 32)
    o, d, t = generate_rays(cam, 32, 32, pid, sid, SEED)
    bg = jnp.asarray(bg, jnp.float32)
    r_jnp = np.asarray(
        trace_paths(scene, o, d, t, pid, sid, SEED, bg, depth)
    )
    r_pl = np.asarray(
        trace_paths_pallas(
            scene, o, d, t, pid, sid, SEED, bg, depth, interpret=True
        )
    )
    return r_jnp, r_pl


def test_cornell_parity():
    scene = build_scene("cornell_box")
    r_jnp, r_pl = _parity(scene, "cornell_box", (0, 0, 0))
    np.testing.assert_allclose(r_pl, r_jnp, rtol=1e-5, atol=1e-6)


def test_final_scene_parity():
    """Exercises motion blur, metal, dielectric, checker, lens blur.

    Both paths build candidate t from the SAME coefficient rows
    (ops/coeffs.py) — the jnp path as one [N,NF]@[NF,P] matmul, the
    kernel as [P,128]@[128,128] sublane matmuls — so the only remaining
    divergence source is matmul accumulation order at f32. That can
    still flip a discrete decision (closest root, Schlick Bernoulli) on
    rare rays whose paths then legitimately diverge; the elementwise
    tolerance budget is correspondingly much tighter than round 2's 3%."""
    scene = build_scene("final_scene")
    r_jnp, r_pl = _parity(
        scene, "final_scene", (0.7, 0.8, 1.0), depth=8, aspect=16 / 9
    )
    assert r_jnp.mean() > 0.1  # sky-lit scene is bright
    diff = np.abs(r_pl - r_jnp)
    assert (diff > 1e-3).mean() < 0.005, f"too many diverged lanes: {(diff>1e-3).mean()}"
    np.testing.assert_allclose(r_pl.mean(axis=0), r_jnp.mean(axis=0), rtol=0.02)


@pytest.mark.parametrize(
    "name", ["two_perlin_spheres", "earth", "simple_light"]
)
def test_texture_scene_parity(name):
    """Perlin-noise and image-texture scenes: kernel vs jnp integrator.

    The Perlin path is gather-for-gather identical so it should agree
    elementwise; the image path computes sphere uv with polynomial
    atan2/acos (~1e-7 rad vs XLA's), which can flip a nearest-neighbor
    texel on a boundary — parity there is elementwise for nearly all
    lanes plus statistical overall (same bar as final_scene)."""
    scene = build_scene(name)
    bg = SCENE_DEFAULTS[name]["background"]
    r_jnp, r_pl = _parity(scene, name, bg, depth=6)
    assert np.isfinite(r_pl).all()
    diff = np.abs(r_pl - r_jnp)
    assert (diff > 1e-3).mean() < 0.005, f"diverged: {(diff > 1e-3).mean()}"
    np.testing.assert_allclose(
        r_pl.mean(axis=0), r_jnp.mean(axis=0), rtol=0.02, atol=5e-3
    )


def test_light_termination_parity():
    b = SceneBuilder()
    b.add_rect("xy", -1, 1, -1, 1, -2.0, b.material(DiffuseLight(emit=Solid((4, 4, 4)))))
    b.add_sphere((0, 0, -1.0), 0.3, b.material(Metal(albedo=(0.9, 0.8, 0.7), fuzz=0.3)))
    b.add_sphere((0.5, 0, -1.2), 0.2, b.material(Dielectric(ir=1.5)))
    b.add_sphere((-0.5, 0, -1.2), 0.2, b.material(Diffuse(albedo=Solid((0.2, 0.6, 0.3)))))
    scene = b.build()
    r_jnp, r_pl = _parity(scene, "cornell_box", (0.1, 0.1, 0.2))
    np.testing.assert_allclose(r_pl, r_jnp, rtol=1e-5, atol=1e-6)


def test_compact_driver_matches_single_kernel():
    """The segmented + compacting driver is bitwise-equal to the single
    50-bounce kernel call: RNG streams are keyed by (pixel, sample,
    bounce) — independent of buffer position — and each ray's radiance
    accumulates in the same order."""
    scene = build_scene("final_scene")
    cam = camera_for_scene("final_scene", aspect_ratio=16 / 9)
    n = 2500  # non-tile-multiple: exercises padding + compaction fill
    pid = jnp.arange(n, dtype=jnp.int32) % (32 * 32)
    sid = jnp.arange(n, dtype=jnp.int32) // (32 * 32)
    o, d, t = generate_rays(cam, 32, 32, pid, sid, SEED)
    bg = jnp.asarray((0.7, 0.8, 1.0), jnp.float32)
    depth = 9
    r_full = trace_paths_pallas(
        scene, o, d, t, pid, sid, SEED, bg, depth, interpret=True
    )
    r_comp = trace_paths_pallas_compact(
        scene, o, d, t, pid, sid, SEED, bg, depth, interpret=True,
        capacities=((1, 0.9), (3, 0.5), (6, 0.3)),
    )
    np.testing.assert_array_equal(np.asarray(r_comp), np.asarray(r_full))


def test_compact_overflow_poisons_output():
    """An over-tight capacity must NaN the whole image, never silently
    drop alive rays."""
    scene = build_scene("cornell_box")  # enclosed: rays stay alive
    cam = camera_for_scene("cornell_box", aspect_ratio=1.0)
    n = 4096
    pid = jnp.arange(n, dtype=jnp.int32) % (32 * 32)
    sid = jnp.arange(n, dtype=jnp.int32) // (32 * 32)
    o, d, t = generate_rays(cam, 32, 32, pid, sid, SEED)
    bg = jnp.zeros(3, jnp.float32)
    r = trace_paths_pallas_compact(
        scene, o, d, t, pid, sid, SEED, bg, 6, interpret=True,
        capacities=((2, 0.1),),  # 4096 alive rays into 1024 slots
    )
    assert np.isnan(np.asarray(r)).all()


def test_compact_overflow_flag_unpoisoned():
    """return_overflow=True reports the overflow WITHOUT poisoning, so a
    driver can recover by re-tracing; without overflow the flag is
    clear and the radiance matches the poisoning variant's."""
    scene = build_scene("cornell_box")
    cam = camera_for_scene("cornell_box", aspect_ratio=1.0)
    n = 4096
    pid = jnp.arange(n, dtype=jnp.int32) % (32 * 32)
    sid = jnp.arange(n, dtype=jnp.int32) // (32 * 32)
    o, d, t = generate_rays(cam, 32, 32, pid, sid, SEED)
    bg = jnp.zeros(3, jnp.float32)
    r, ovf = trace_paths_pallas_compact(
        scene, o, d, t, pid, sid, SEED, bg, 6, interpret=True,
        capacities=((2, 0.1),), return_overflow=True,
    )
    assert bool(ovf)
    assert np.isfinite(np.asarray(r)).all()
    r2, ovf2 = trace_paths_pallas_compact(
        scene, o, d, t, pid, sid, SEED, bg, 6, interpret=True,
        capacities=((2, 0.9),), return_overflow=True,
    )
    assert not bool(ovf2)
    r2_poison_variant = trace_paths_pallas_compact(
        scene, o, d, t, pid, sid, SEED, bg, 6, interpret=True,
        capacities=((2, 0.9),),
    )
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r2_poison_variant))


def test_unsorted_capacity_schedule():
    """An unsorted/duplicated schedule must behave as its sorted dedupe
    (round-1 bug: first-in-list-order boundary pick skipped shrinks)."""
    scene = build_scene("final_scene")
    cam = camera_for_scene("final_scene", aspect_ratio=16 / 9)
    n = 2048
    pid = jnp.arange(n, dtype=jnp.int32) % (32 * 32)
    sid = jnp.arange(n, dtype=jnp.int32) // (32 * 32)
    o, d, t = generate_rays(cam, 32, 32, pid, sid, SEED)
    bg = jnp.asarray((0.7, 0.8, 1.0), jnp.float32)
    kw = dict(interpret=True, return_overflow=True)
    r_sorted, _ = trace_paths_pallas_compact(
        scene, o, d, t, pid, sid, SEED, bg, 8,
        capacities=((2, 0.8), (5, 0.5)), **kw,
    )
    r_unsorted, _ = trace_paths_pallas_compact(
        scene, o, d, t, pid, sid, SEED, bg, 8,
        capacities=((5, 0.5), (2, 0.8), (5, 0.5)), **kw,
    )
    np.testing.assert_array_equal(np.asarray(r_unsorted), np.asarray(r_sorted))


def test_render_overflow_recovery(monkeypatch):
    """End-to-end: a render whose compaction capacity overflows must
    produce the same framebuffer as the uncompacted kernel — recovery
    re-traces the overflowed batch instead of NaN-poisoning (round-1
    behavior) or silently dropping rays."""
    import sys

    from jax.experimental.pallas import tpu as pltpu

    import rtweekend_tpu.render  # noqa: F401

    render_mod = sys.modules["rtweekend_tpu.render"]

    scene = build_scene("cornell_box")
    cam = camera_for_scene("cornell_box", aspect_ratio=1.0)
    bg = (0.0, 0.0, 0.0)
    w = h = 16
    spp, depth = 4, 6
    monkeypatch.setattr(
        render_mod, "_capacities_for", lambda bg_: ((2, 0.1),)
    )
    with pltpu.force_tpu_interpret_mode():
        fb = render_mod.render(
            scene, cam, w, h, spp, depth, bg, 42, use_pallas=True
        )
        want = render_mod.render_batch(
            scene, cam, jnp.asarray(bg, jnp.float32), jnp.uint32(42),
            jnp.int32(0), jnp.zeros((h, w, 3), jnp.float32),
            width=w, height=h, n_samples=spp, max_depth=depth,
            use_pallas=True,
        )
    fb, want = np.asarray(fb), np.asarray(want)
    assert np.isfinite(fb).all()
    np.testing.assert_allclose(fb, want, rtol=1e-5, atol=1e-6)


def test_padding_rays():
    """Ray counts that don't fill a 1024-lane tile are padded and
    sliced back."""
    scene = build_scene("cornell_box")
    cam = camera_for_scene("cornell_box", aspect_ratio=1.0)
    n = 100
    pid = jnp.arange(n, dtype=jnp.int32)
    sid = jnp.zeros(n, jnp.int32)
    o, d, t = generate_rays(cam, 32, 32, pid, sid, SEED)
    bg = jnp.zeros(3)
    r_pl = trace_paths_pallas(
        scene, o, d, t, pid, sid, SEED, bg, 4, interpret=True
    )
    r_jnp = trace_paths(scene, o, d, t, pid, sid, SEED, bg, 4)
    assert r_pl.shape == (n, 3)
    np.testing.assert_allclose(
        np.asarray(r_pl), np.asarray(r_jnp), rtol=1e-5, atol=1e-6
    )
