"""Command-line renderer.

The reference has no CLI at all — every knob is a comptime constant
(reference src/main.zig:304-310; build args are forwarded but ignored,
build.zig:93-95). Here: scene registry + size/spp/depth/seed/output
flags, backend/kernel selection, checkpoint/resume, and profiling
(SURVEY.md §5 config plan).
"""

from __future__ import annotations

import argparse
import sys
import time

from rtweekend_tpu.config import SCENE_DEFAULTS, RenderConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rtweekend-tpu", description=__doc__)
    p.add_argument("scene", nargs="?", default="cornell_box", choices=sorted(SCENE_DEFAULTS))
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--spp", type=int, default=None, help="samples per pixel")
    p.add_argument("--max-depth", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dtype", default="float32", choices=["float32", "float64"])
    p.add_argument("--output", "-o", default="out.png")
    p.add_argument("--ppm", action="store_true", help="also write a P3 .ppm next to the output")
    p.add_argument("--rays-per-chunk", type=int, default=1 << 20)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument(
        "--kernel", choices=["auto", "pallas", "jnp"], default="auto",
        help="hot-path implementation (auto = Pallas on TPU when the scene supports it)",
    )
    p.add_argument(
        "--adaptive-caps", action="store_true",
        help="derive the wavefront-compaction schedule from a CPU "
             "alive-fraction probe instead of the static heuristic",
    )
    p.add_argument(
        "--checkpoint", default=None, metavar="PATH",
        help="checkpoint file for resumable rendering",
    )
    p.add_argument(
        "--profile-dir", default=None, metavar="DIR",
        help="capture a jax.profiler trace (perfetto) into DIR",
    )
    p.add_argument(
        "--metrics", default=None, metavar="PATH",
        help="append structured JSON-lines render metrics to PATH",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        # Without x64 enabled, f64 arrays silently downcast to f32;
        # parity mode must be bit-honest end to end.
        jax.config.update("jax_enable_x64", True)

    defaults = SCENE_DEFAULTS[args.scene]
    cfg = RenderConfig(
        scene=args.scene,
        width=args.width or defaults["width"],
        height=args.height or defaults["height"],
        samples_per_pixel=args.spp or defaults["samples_per_pixel"],
        max_depth=args.max_depth,
        seed=args.seed,
        dtype=args.dtype,
        rays_per_chunk=args.rays_per_chunk,
        output=args.output,
    )

    from rtweekend_tpu.models.builders import build_scene
    from rtweekend_tpu.render import (
        camera_for_scene,
        default_use_pallas,
        render,
        render_image,
    )
    from rtweekend_tpu.utils import image as image_mod
    from rtweekend_tpu.utils import profiling

    use_pallas = None
    if args.kernel != "auto":
        use_pallas = args.kernel == "pallas"

    metrics = None
    if args.metrics:
        from rtweekend_tpu.utils.metrics import MetricsLogger

        metrics = MetricsLogger(args.metrics)

    capacities = None
    if args.adaptive_caps:
        from rtweekend_tpu.render import adaptive_capacities

        capacities = adaptive_capacities(
            cfg.scene, SCENE_DEFAULTS[cfg.scene]["background"], cfg.max_depth
        )
        print(f"adaptive compaction schedule: {capacities}")

    t0 = time.time()
    with profiling.trace(args.profile_dir):
        if args.checkpoint:
            import jax.numpy as jnp
            import numpy as np

            from rtweekend_tpu import checkpoint as ckpt

            dtype = cfg.jnp_dtype
            scene = build_scene(cfg.scene, seed=cfg.seed, dtype=dtype)
            camera = camera_for_scene(
                cfg.scene, dtype=dtype, aspect_ratio=cfg.width / cfg.height
            )
            accum = ckpt.render_resumable(
                scene, camera, cfg.scene, cfg.width, cfg.height,
                cfg.samples_per_pixel, cfg.max_depth,
                SCENE_DEFAULTS[cfg.scene]["background"], cfg.seed,
                args.checkpoint, rays_per_chunk=cfg.rays_per_chunk,
                use_pallas=use_pallas, progress=True,
            )
            img = np.asarray(image_mod.tonemap(accum, cfg.samples_per_pixel))
        else:
            img, accum = render_image(
                cfg, progress=True, use_pallas=use_pallas, metrics=metrics,
                capacities=capacities,
            )
    dt = time.time() - t0
    if metrics is not None:
        metrics.close()

    # Loud failure: a non-finite radiance sum must never tonemap into a
    # silently black PNG. (This reads the buffer the PNG write fetches
    # anyway, so it costs no extra device->host transfer.)
    import numpy as _np

    if not _np.isfinite(_np.asarray(accum)).all():
        raise RuntimeError(
            "render produced non-finite radiance (NaN/Inf) — this indicates "
            "a kernel bug or an unrecovered wavefront-capacity overflow; "
            "re-run with --kernel jnp to bisect"
        )

    image_mod.write_png(cfg.output, img)
    if args.ppm:
        image_mod.write_ppm(cfg.output.rsplit(".", 1)[0] + ".ppm", img)
    n_rays = cfg.width * cfg.height * cfg.samples_per_pixel
    print(
        f"wrote {cfg.output}: {cfg.width}x{cfg.height} @ {cfg.samples_per_pixel}spp "
        f"in {dt:.1f}s ({n_rays / dt / 1e6:.3f} Mray/s primary incl. compile)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
