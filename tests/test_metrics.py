"""Structured metrics logging (utils/metrics.py + render integration)."""

import io
import json

import numpy as np

from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.render import camera_for_scene, render
from rtweekend_tpu.utils.metrics import MetricsLogger


def test_logger_writes_json_lines(tmp_path):
    p = str(tmp_path / "m.jsonl")
    with MetricsLogger(p) as m:
        m.log("hello", a=1)
        m.log("world", b="x")
    recs = [json.loads(line) for line in open(p)]
    assert [r["event"] for r in recs] == ["hello", "world"]
    assert recs[0]["a"] == 1 and recs[1]["b"] == "x"
    assert all("ts" in r and "t_s" in r for r in recs)


def test_render_emits_metrics():
    buf = io.StringIO()
    m = MetricsLogger(stream=buf)
    scene = build_scene("two_spheres")
    cam = camera_for_scene("two_spheres", aspect_ratio=1.0)
    fb = render(
        scene, cam, 8, 8, 4, 3, (0.7, 0.8, 1.0), 42,
        rays_per_chunk=8 * 8 * 2, use_pallas=False, metrics=m,
    )
    assert np.isfinite(np.asarray(fb)).all()
    recs = [json.loads(line) for line in buf.getvalue().splitlines()]
    events = [r["event"] for r in recs]
    assert events[0] == "render_start"
    assert events.count("batch_submitted") == 2  # spp 4 in batches of 2
    assert events[-1] == "render_done"
    done = recs[-1]
    assert done["rays_per_s"] > 0
    assert done["spp"] == 4
    assert recs[0]["n_devices"] >= 1
