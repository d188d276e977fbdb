"""parity.py harness mechanics (the full 600x400 run is a TPU job; see
parity_report.json + BASELINE.md row 1 for recorded numbers)."""

import numpy as np

import parity


def test_compare_identical_images():
    img = np.random.default_rng(0).uniform(size=(60, 90, 3))
    m = parity.compare(img, img)
    assert m["lum_hist_l1"] == 0.0
    assert all(v == 0.0 for v in m["region_mean_abs_diff"].values())
    assert m["channel_means_ours"] == m["channel_means_golden"]
    assert m["sky_mean_ours"] == m["sky_mean_golden"]


def test_compare_detects_shift():
    rng = np.random.default_rng(0)
    a = rng.uniform(0.2, 0.4, size=(60, 90, 3))
    b = a + 0.3
    m = parity.compare(a, b)
    assert abs(m["sky_mean_ours"] - m["sky_mean_golden"]) > 0.25
    assert m["lum_hist_l1"] > 0.0


def test_golden_loads():
    g = parity._load_golden()
    assert g.shape == (400, 600, 3)
    assert 0.0 <= g.min() and g.max() <= 1.0
