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


# BASELINE.json configs 1-4 rendered to committed self-golden artifacts
# (VERDICT r4 missing #3). The reference cannot render these — scenes
# 1-5 do not compile at its HEAD (SURVEY.md §4) — so the right form is
# a committed artifact + stats + checksum tying each BASELINE config to
# a reproducible render at fixed keys. Config 1 commits PPM (the
# BASELINE "PPM parity" format); 2-4 commit PNG.
BASELINE_CONFIGS = (
    # (key, scene, width, height, spp, max_depth, format)
    ("config1_book1_diffuse", "book1_diffuse", 200, 100, 10, 10, "ppm"),
    ("config2_book1_metal_dielectric", "book1_metal_dielectric",
     400, 225, 50, 50, "png"),
    ("config3_book1_defocus", "book1_defocus", 400, 225, 100, 50, "png"),
    ("config4_final_scene", "final_scene", 1200, 675, 100, 50, "png"),
)


def render_baseline_configs(out_dir: str = "artifacts") -> dict:
    import hashlib
    import os

    import jax

    from rtweekend_tpu.config import SCENE_DEFAULTS
    from rtweekend_tpu.models.builders import build_scene
    from rtweekend_tpu.render import camera_for_scene, render
    from rtweekend_tpu.utils import image as image_mod

    os.makedirs(out_dir, exist_ok=True)
    rows = {}
    for key, scene_name, w, h, spp, depth, fmt in BASELINE_CONFIGS:
        scene = build_scene(scene_name, seed=42)
        camera = camera_for_scene(scene_name, aspect_ratio=w / h)
        bg = SCENE_DEFAULTS[scene_name]["background"]
        accum = render(scene, camera, w, h, spp, depth, bg, 42)
        img = np.asarray(image_mod.tonemap(accum, spp))
        path = os.path.join(out_dir, f"{key}_{w}x{h}_{spp}spp.{fmt}")
        if fmt == "ppm":
            image_mod.write_ppm(path, img)
        else:
            image_mod.write_png(path, img)
        with open(path, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        rows[key] = {
            "scene": scene_name, "width": w, "height": h, "spp": spp,
            "max_depth": depth, "seed": 42, "artifact": path,
            "sha256": digest,
            "backend": jax.default_backend(),
            "channel_means": [round(float(m), 4) for m in
                              (img / 255.0).mean(axis=(0, 1))],
            "finite": bool(np.isfinite(np.asarray(accum)).all()),
        }
        print(f"{key}: {path} sha256={digest[:12]}...")
    return rows


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
    p.add_argument("--configs", action="store_true",
                   help="also render BASELINE configs 1-4 to committed "
                        "artifacts (artifacts/) and report their stats")
    args = p.parse_args(argv)

    config_rows = render_baseline_configs() if args.configs else None

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
    if config_rows is not None:
        report["baseline_configs"] = config_rows
    elif "baseline_configs" not in report:
        # keep existing config rows when re-running without --configs
        try:
            with open(args.out) as f:
                prev = json.load(f)
            if "baseline_configs" in prev:
                report["baseline_configs"] = prev["baseline_configs"]
        except (OSError, json.JSONDecodeError):
            pass
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["metrics"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
