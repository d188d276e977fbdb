"""Forward-parity harness vs the reference's committed golden render.

The reference repo's ONLY verification artifact is
RayTracingInOneWeekend.png (600x400, reference README.md:3). Bitwise
parity is impossible in principle (SURVEY.md §6): the reference draws
one serial Xoshiro256++ stream through scene generation AND sampling,
so its sphere grid and jitter sequence cannot be replicated by any
other PRNG. On top of that, the golden predates the reference's HEAD:
it shows a PLAIN gray ground and a closer camera, while HEAD's
generateRandomScene (src/main.zig:157-221) builds a CHECKER ground —
and HEAD's scenes 1-5 do not even compile (SURVEY.md §4). The golden is
therefore comparable only *distributionally*.

This harness renders our random_scene (HEAD semantics: checker ground,
6x6 grid, motion blur, camera of main.zig:320-331) at the golden's
600x400 geometry and reports:
- per-channel global means (ours vs golden),
- sky-region means (top 12% rows: deterministic background gradient —
  the tightest comparable statistic),
- 32-bin luminance histogram L1 distance,
- a 3x3 regional mean-abs-diff grid.

Run:  python parity.py [--spp 50] [--out parity_report.json]
The JSON report is what BASELINE.md row 1 cites.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

REFERENCE_GOLDEN = "/root/reference/RayTracingInOneWeekend.png"


def _tonemapped_ours(spp: int, width: int = 600, height: int = 400,
                     scene_name: str = "golden_scene"):
    from rtweekend_tpu.config import SCENE_DEFAULTS
    from rtweekend_tpu.models.builders import build_scene
    from rtweekend_tpu.render import camera_for_scene, render
    from rtweekend_tpu.utils import image as image_mod

    scene = build_scene(scene_name, seed=42)
    camera = camera_for_scene(scene_name, aspect_ratio=width / height)
    bg = SCENE_DEFAULTS[scene_name]["background"]
    accum = render(scene, camera, width, height, spp, 50, bg, 42)
    return np.asarray(image_mod.tonemap(accum, spp)).astype(np.float64) / 255.0


def _load_golden():
    from rtweekend_tpu.utils.image import read_image_rgba

    rgba = read_image_rgba(REFERENCE_GOLDEN)
    return rgba[..., :3].astype(np.float64) / 255.0


def _lum(img):
    return img @ np.array([0.2126, 0.7152, 0.0722])


def compare(ours: np.ndarray, golden: np.ndarray) -> dict:
    assert ours.shape == golden.shape, (ours.shape, golden.shape)
    h = ours.shape[0]
    sky = slice(0, max(1, int(0.12 * h)))
    lo, lg = _lum(ours), _lum(golden)
    hist_o, edges = np.histogram(lo, bins=32, range=(0, 1), density=True)
    hist_g, _ = np.histogram(lg, bins=32, range=(0, 1), density=True)
    regions = {}
    hs, ws = h // 3, ours.shape[1] // 3
    for i in range(3):
        for j in range(3):
            ro = ours[i * hs:(i + 1) * hs, j * ws:(j + 1) * ws]
            rg = golden[i * hs:(i + 1) * hs, j * ws:(j + 1) * ws]
            regions[f"r{i}{j}"] = round(
                float(abs(ro.mean() - rg.mean())), 4
            )
    return {
        "channel_means_ours": [round(float(m), 4) for m in ours.mean((0, 1))],
        "channel_means_golden": [
            round(float(m), 4) for m in golden.mean((0, 1))
        ],
        "sky_mean_ours": round(float(ours[sky].mean()), 4),
        "sky_mean_golden": round(float(golden[sky].mean()), 4),
        "lum_hist_l1": round(float(np.abs(hist_o - hist_g).mean()), 4),
        "region_mean_abs_diff": regions,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--spp", type=int, default=100)
    p.add_argument(
        "--scene", default="golden_scene",
        choices=["golden_scene", "random_scene"],
        help="golden_scene reconstructs the golden's evident pre-HEAD "
             "scene (gray ground, static spheres, gradient sky); "
             "random_scene is HEAD semantics (checker ground, motion)",
    )
    p.add_argument("--out", default="parity_report.json")
    p.add_argument("--save-png", default=None,
                   help="also write our render next to the report")
    args = p.parse_args(argv)

    golden = _load_golden()
    ours = _tonemapped_ours(
        args.spp, golden.shape[1], golden.shape[0], args.scene
    )
    if args.save_png:
        from rtweekend_tpu.utils.image import write_png

        write_png(args.save_png, (ours * 255.0 + 0.5).astype(np.uint8))
    report = {
        "config": {
            "scene": args.scene,
            "width": golden.shape[1],
            "height": golden.shape[0],
            "spp": args.spp,
            "max_depth": 50,
            "seed": 42,
        },
        "semantics": (
            "statistical parity: the reference draws one serial RNG "
            "stream through scene generation AND sampling "
            "(main.zig:300), so the sphere-grid placements/colors "
            "cannot be replicated draw-for-draw; golden_scene matches "
            "the golden's evident pre-HEAD form (book-1 final scene: "
            "gray ground, static spheres, 22x22 grid, gradient sky — "
            "verified against the golden's own sky rows, see "
            "integrator.sky_color). Expected agreement: sky rows tight "
            "(deterministic), global/region means to within the "
            "random-grid realization noise"
        ),
        "metrics": compare(ours, golden),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["metrics"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
