"""Headline benchmark: rays/s/chip on the 1200x675 book-cover final
scene (BASELINE.md north star; the reference publishes no numbers, so
vs_baseline compares against this repo's first recorded TPU result,
stored in BENCH_BASELINE.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

"rays" counts camera samples (primary rays), the standard denominator;
each traces up to `depth` bounces of the wavefront.

Timing protocol (remote-TPU runtime quirks, see
rtweekend_tpu/ops/pallas/megakernel.py): `block_until_ready` can return
before execution completes on this backend, and the first device->host
read flips the session into synchronous dispatch. So: warm up (compile
+ execute), force completion with a scalar fetch, then time a full
render ending in its own scalar fetch — a conservative, honestly
blocking measurement.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT = 1200, 675
SPP_MEASURE = 20          # measured sample count; rays/s extrapolates
MAX_DEPTH = 50
RAYS_PER_CHUNK = 1 << 22  # 5-spp wavefronts: best measured chunking
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def main():
    from rtweekend_tpu.models.builders import build_scene
    from rtweekend_tpu.render import camera_for_scene, render

    scene = build_scene("final_scene")
    camera = camera_for_scene("final_scene", aspect_ratio=WIDTH / HEIGHT)
    background = (0.70, 0.80, 1.00)

    kwargs = dict(
        width=WIDTH, height=HEIGHT, samples_per_pixel=SPP_MEASURE,
        max_depth=MAX_DEPTH, background=background, seed=42,
        rays_per_chunk=RAYS_PER_CHUNK,
    )

    # warmup: compiles every executable at the measured shapes; the
    # scalar fetch forces completion (and drops the session into
    # synchronous dispatch, which is the honest mode to time).
    warm = render(scene, camera, **kwargs)
    wsum = float(jnp.sum(warm))
    assert np.isfinite(wsum), "warmup produced non-finite radiance"

    t0 = time.perf_counter()
    accum = render(scene, camera, **kwargs)
    total = float(jnp.sum(accum))  # forces real completion
    dt = time.perf_counter() - t0
    assert np.isfinite(total), "render produced non-finite radiance"

    n_rays = WIDTH * HEIGHT * SPP_MEASURE
    rays_per_s = n_rays / dt

    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = rays_per_s
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {"metric": "rays_per_s_chip_final_scene", "value": rays_per_s,
                 "recorded": time.strftime("%Y-%m-%d"),
                 "note": "first TPU measurement; vs_baseline compares to this"},
                f, indent=1,
            )

    print(json.dumps({
        "metric": "rays_per_s_chip_final_scene_1200x675",
        "value": round(rays_per_s, 1),
        "unit": "primary_rays/s",
        "vs_baseline": round(rays_per_s / baseline, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
