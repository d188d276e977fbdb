"""Equivalence of the packed-gather replay (ops/replay.py) with the
reference replay implementation (ops/integrator.trace_paths_replay) —
same winners in, same radiance and gradients out."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.ops.camera import generate_rays
from rtweekend_tpu.ops.integrator import trace_paths, trace_paths_replay
from rtweekend_tpu.ops.pallas.megakernel import trace_paths_pallas
from rtweekend_tpu.ops.replay import trace_paths_replay_fast
from rtweekend_tpu.parallel.shard import extract_params, merge_params
from rtweekend_tpu.render import camera_for_scene

W = H = 12
SPP = 2
DEPTH = 4


def _setup(name, bg):
    scene = build_scene(name)
    camera = camera_for_scene(name, aspect_ratio=1.0)
    seed = jnp.uint32(11)
    n_pix = W * H
    pids = jnp.repeat(jnp.arange(n_pix, dtype=jnp.int32), SPP)
    sids = jnp.tile(jnp.arange(SPP, dtype=jnp.int32), n_pix)
    o, d, t = generate_rays(camera, W, H, pids, sids, seed)
    bg = jnp.asarray(bg, jnp.float32)
    _, winners = trace_paths_pallas(
        scene, o, d, t, pids, sids, seed, bg, DEPTH,
        interpret=True, return_winners=True,
    )
    return scene, (o, d, t, pids, sids, seed, bg), winners


# scenes covering rects+noise, spheres+checker+motion, and image textures
@pytest.mark.parametrize("name,bg", [
    ("simple_light", (0.0, 0.0, 0.0)),
    ("random_scene", (0.7, 0.8, 1.0)),
    ("earth", (0.7, 0.8, 1.0)),
])
def test_replay_fast_matches_replay(name, bg):
    scene, (o, d, t, pids, sids, seed, bgc), winners = _setup(name, bg)
    slow = np.asarray(trace_paths_replay(
        scene, o, d, t, pids, sids, seed, bgc, winners
    ))
    fast = np.asarray(trace_paths_replay_fast(
        scene, o, d, t, pids, sids, seed, bgc, winners
    ))
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)
    # and both equal the full jnp trace up to winner-root reassociation
    full = np.asarray(trace_paths(
        scene, o, d, t, pids, sids, seed, bgc, DEPTH
    ))
    rel = np.abs(fast - full) / (np.abs(full) + 1e-3)
    assert (rel > 1e-3).mean() < 0.01


def test_replay_fast_grads_match_replay():
    scene, (o, d, t, pids, sids, seed, bgc), winners = _setup(
        "simple_light", (0.0, 0.0, 0.0)
    )
    params = extract_params(scene)

    def loss(fn):
        def f(p):
            sc = merge_params(scene, p)
            return jnp.mean(fn(
                sc, o, d, t, pids, sids, seed, bgc, winners
            ))
        return f

    g_slow = jax.grad(loss(trace_paths_replay))(params)
    g_fast = jax.grad(loss(trace_paths_replay_fast))(params)
    for k in g_slow:
        np.testing.assert_allclose(
            np.asarray(g_fast[k]), np.asarray(g_slow[k]),
            rtol=1e-4, atol=1e-6,
        )


def test_replay_fast_gradient_sky():
    """Gradient-sky misses accumulate identically in both replays."""
    scene, (o, d, t, pids, sids, seed, _), winners = _setup(
        "random_scene", (0.7, 0.8, 1.0)
    )
    bg = jnp.asarray([[1.0, 1.0, 1.0], [0.5, 0.7, 1.0]], jnp.float32)
    slow = np.asarray(trace_paths_replay(
        scene, o, d, t, pids, sids, seed, bg, winners
    ))
    fast = np.asarray(trace_paths_replay_fast(
        scene, o, d, t, pids, sids, seed, bg, winners
    ))
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)
