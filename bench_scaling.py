"""Scaling benchmark: rays/s vs device count (BASELINE.md row 4).

Weak scaling on the sample axis: each device traces the full pixel grid
at `--spp-per-device` samples, so per-device work is constant and ideal
scaling is rays/s proportional to device count. The SAME
`parallel.shard.render_sharded` code path runs everywhere — a real pod
run needs zero code changes (only more devices visible to JAX):

- default here: the 8-virtual-device CPU mesh (the container has one
  physical TPU chip behind a tunnel, so multi-chip numbers come from
  virtual devices; they share 2 host vCPUs, so the printed CPU
  efficiency measures harness overhead, not ICI).
- on a pod slice: run unmodified; devices = real chips, efficiency is
  the ICI number the >=90% bar applies to.

Emits one JSON line per mesh size and a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="final_scene")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=144)
    p.add_argument("--spp-per-device", type=int, default=4)
    p.add_argument("--max-depth", type=int, default=8)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument(
        "--backend", default="cpu", choices=["cpu", "tpu", "default"],
        help="cpu = 8 virtual host devices (default); tpu/default = "
        "whatever jax.devices() exposes",
    )
    args = p.parse_args(argv)

    if args.backend == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from rtweekend_tpu.config import SCENE_DEFAULTS
    from rtweekend_tpu.models.builders import build_scene
    from rtweekend_tpu.parallel.mesh import make_mesh
    from rtweekend_tpu.parallel.shard import render_sharded
    from rtweekend_tpu.render import camera_for_scene

    devices = jax.devices()
    scene = build_scene(args.scene, seed=42)
    camera = camera_for_scene(
        args.scene, aspect_ratio=args.width / args.height
    )
    bg = SCENE_DEFAULTS[args.scene]["background"]

    sizes = [k for k in (1, 2, 4, 8, 16, 32) if k <= len(devices)]
    rates = {}
    for k in sizes:
        mesh = make_mesh((1, k), devices[:k])
        spp = args.spp_per_device * k

        def run():
            return render_sharded(
                scene, camera, args.width, args.height, spp,
                args.max_depth, bg, 42, mesh,
            )

        run().block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            fb = run()
        fb.block_until_ready()
        dt = (time.perf_counter() - t0) / args.repeats
        rays = args.width * args.height * spp
        rates[k] = rays / dt
        print(json.dumps({
            "devices": k, "spp": spp, "rays_per_s": round(rates[k]),
            "efficiency_vs_1dev": round(rates[k] / (k * rates[sizes[0]]), 4),
        }))

    kmax = sizes[-1]
    print(json.dumps({
        "metric": f"weak_scaling_efficiency_{kmax}dev_{args.backend}",
        "value": round(rates[kmax] / (kmax * rates[sizes[0]]), 4),
        "unit": "fraction_of_linear",
        "note": "virtual CPU devices share host cores; the >=90% bar "
        "applies to real chips over ICI",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
