"""Observability utilities."""

import jax.numpy as jnp
import numpy as np

from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.ops.camera import generate_rays
from rtweekend_tpu.render import camera_for_scene
from rtweekend_tpu.utils import profiling


def test_phase_timer():
    t = profiling.PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a:" in t.summary()


def test_alive_fractions_decay():
    """Wavefront occupancy: all rays alive at bounce 0, monotone-ish
    decay after (rays die on sky miss / light hit / metal absorb)."""
    scene = build_scene("cornell_box")
    cam = camera_for_scene("cornell_box", aspect_ratio=1.0)
    n = 2048
    pid = jnp.arange(n, dtype=jnp.int32) % (32 * 32)
    sid = jnp.arange(n, dtype=jnp.int32) // (32 * 32)
    seed = jnp.uint32(1)
    o, d, t = generate_rays(cam, 32, 32, pid, sid, seed)
    fr = np.asarray(
        profiling.alive_fractions(scene, o, d, t, pid, sid, seed, 10)
    )
    assert fr.shape == (10,)
    assert fr[0] == 1.0
    assert fr[-1] < fr[0]
    # cornell: paths die only by hitting the light or escaping through
    # the open... the box is closed, so decay is slow but present
    assert np.all(np.diff(fr) <= 1e-6)


def test_trace_report_parses_profiler_output(tmp_path):
    """utils.trace_report aggregates a real jax.profiler trace; on the
    CPU backend there are no device pids, so the report must be valid
    with zero device time (the TPU path is exercised by the round-5
    perf work it documents)."""
    import jax
    import jax.numpy as jnp

    from rtweekend_tpu.utils import trace_report

    @jax.jit
    def f(x):
        return jnp.sum(x * x)

    f(jnp.ones((128, 128))).block_until_ready()
    with jax.profiler.trace(str(tmp_path)):
        f(jnp.ones((128, 128))).block_until_ready()
    rep = trace_report.report(str(tmp_path))
    assert set(rep) == {
        "device_total_s", "by_source", "by_hlo_category", "by_op"
    }
    assert rep["device_total_s"] >= 0.0
