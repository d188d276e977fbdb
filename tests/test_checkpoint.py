"""Checkpoint/resume: resumed renders must equal uninterrupted ones
exactly (counter-based RNG keys samples by index)."""

import jax.numpy as jnp
import numpy as np

from rtweekend_tpu import checkpoint
from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.render import camera_for_scene, render

W = H = 16
SPP = 8
DEPTH = 3


def test_save_load_roundtrip(tmp_path):
    st = checkpoint.RenderState(
        accum=np.random.default_rng(0).uniform(size=(4, 4, 3)).astype(np.float32),
        samples_done=5,
        meta={"scene": "x", "version": 1},
    )
    p = str(tmp_path / "r.ckpt")
    checkpoint.save(p, st)
    back = checkpoint.load(p)
    np.testing.assert_array_equal(back.accum, st.accum)
    assert back.samples_done == 5 and back.meta == st.meta


def test_resume_matches_uninterrupted(tmp_path):
    scene = build_scene("two_spheres")
    cam = camera_for_scene("two_spheres", aspect_ratio=1.0)
    bg = (0.7, 0.8, 1.0)
    p = str(tmp_path / "r.ckpt")

    full = np.asarray(
        render(scene, cam, W, H, SPP, DEPTH, bg, 42, rays_per_chunk=W * H * 2)
    )

    # simulate a partial run: 4 of 8 samples, checkpointed
    partial = np.asarray(
        render(scene, cam, W, H, 4, DEPTH, bg, 42, rays_per_chunk=W * H * 2)
    )
    checkpoint.save(
        p,
        checkpoint.RenderState(
            partial, 4,
            checkpoint._meta("two_spheres", W, H, SPP, DEPTH, 42),
        ),
    )

    resumed = np.asarray(
        checkpoint.render_resumable(
            scene, cam, "two_spheres", W, H, SPP, DEPTH, bg, 42, p,
            rays_per_chunk=W * H * 2, use_pallas=False,
        )
    )
    np.testing.assert_allclose(resumed, full, rtol=1e-6, atol=1e-6)


def test_stale_checkpoint_restarts(tmp_path):
    scene = build_scene("two_spheres")
    cam = camera_for_scene("two_spheres", aspect_ratio=1.0)
    bg = (0.7, 0.8, 1.0)
    p = str(tmp_path / "r.ckpt")
    # checkpoint with a DIFFERENT config fingerprint
    checkpoint.save(
        p,
        checkpoint.RenderState(
            np.full((H, W, 3), 99.0, np.float32), 4,
            checkpoint._meta("two_spheres", W, H, SPP, DEPTH, 7),  # seed 7
        ),
    )
    out = np.asarray(
        checkpoint.render_resumable(
            scene, cam, "two_spheres", W, H, SPP, DEPTH, bg, 42, p,
            rays_per_chunk=W * H * 2, use_pallas=False,
        )
    )
    full = np.asarray(
        render(scene, cam, W, H, SPP, DEPTH, bg, 42, rays_per_chunk=W * H * 2)
    )
    np.testing.assert_allclose(out, full, rtol=1e-6, atol=1e-6)


def test_resumable_pallas_compact_path(tmp_path):
    """The resumable driver uses the SAME compacted Pallas hot path as
    render() (round-1 drift: it silently used the slow kernel)."""
    from jax.experimental.pallas import tpu as pltpu

    scene = build_scene("two_spheres")
    cam = camera_for_scene("two_spheres", aspect_ratio=1.0)
    bg = (0.7, 0.8, 1.0)
    p = str(tmp_path / "r.ckpt")
    with pltpu.force_tpu_interpret_mode():
        full = np.asarray(
            render(
                scene, cam, W, H, SPP, DEPTH, bg, 42,
                rays_per_chunk=W * H * 2, use_pallas=True,
            )
        )
        resumed = np.asarray(
            checkpoint.render_resumable(
                scene, cam, "two_spheres", W, H, SPP, DEPTH, bg, 42, p,
                rays_per_chunk=W * H * 2, use_pallas=True,
            )
        )
    np.testing.assert_allclose(resumed, full, rtol=1e-6, atol=1e-6)
