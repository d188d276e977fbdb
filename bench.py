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

# VPU peak estimate by device kind (the megakernel is VPU-bound: the
# primitive march is elementwise f32, no MXU). Formula: lanes(8x128) x
# ALUs(4) x 2 FLOP (FMA) x clock x cores. v5e: 1024*4*2*0.94e9 ~ 7.7e12.
_VPU_PEAK = {
    "TPU v5 lite": 7.7e12,
    "TPU v4": 2 * 7.7e12,      # 2 TensorCores/chip
    "TPU v5p": 2 * 8.4e12,
    "TPU v6 lite": 7.4e12,     # 940MHz-class, 1 core
}


def _executed_lane_bounces(n_rays_batch, n_batches, max_depth, capacities):
    """Lane-bounces the compacted driver actually executes per full
    render: sum over segments of capacity x segment length (the kernel
    marches every lane of a segment's buffer, alive or not)."""
    from rtweekend_tpu.ops.pallas.megakernel import _tiles

    caps = sorted(
        {b: _tiles(int(f * n_rays_batch))
         for b, f in capacities if 0 < b < max_depth}.items()
    )
    boundaries = [b for b, _ in caps] + [max_depth]
    cap_at = dict(caps)
    total = 0
    b, cap = 0, _tiles(n_rays_batch)
    while b < max_depth:
        nxt = next(x for x in boundaries if x > b)
        cap = min(cap, cap_at.get(b, cap))
        total += cap * (nxt - b)
        b = nxt
    return total * n_batches


def _roofline(scene, dt, n_rays, rays_per_s):
    """MFU + speed-of-light accounting for the measured render."""
    import jax

    from rtweekend_tpu.ops.pallas.megakernel import CAPS_OPEN

    kind = jax.devices()[0].device_kind
    peak = _VPU_PEAK.get(kind)
    n_prims = (
        scene.spheres.radius.shape[0] + scene.rects.k.shape[0]
    )
    flops_per_lane_bounce = n_prims * 25 + 150
    batch = max(1, RAYS_PER_CHUNK // (WIDTH * HEIGHT)) * WIDTH * HEIGHT
    n_batches = -(-n_rays // batch)
    lane_bounces = _executed_lane_bounces(
        batch, n_batches, MAX_DEPTH, CAPS_OPEN
    )
    flops = lane_bounces * flops_per_lane_bounce
    achieved = flops / dt
    out = {
        "device_kind": kind,
        "exec_gflops_per_s": round(achieved / 1e9, 1),
        "exec_flops_per_ray": round(flops / n_rays, 1),
    }
    if peak:
        out["vpu_peak_gflops"] = round(peak / 1e9)
        out["mfu_pct"] = round(100.0 * achieved / peak, 2)
        # speed-of-light: rays/s if the VPU were saturated on exactly
        # the work the compacted schedule executes
        out["sol_rays_per_s"] = round(peak / (flops / n_rays))
        out["pct_of_sol"] = round(100.0 * rays_per_s * flops / n_rays / peak, 2)
    return out


def _bench_fwd_bwd():
    """Gradient-step throughput: Pallas forward + remat'd jnp backward
    (ops/pallas/vjp.py) through a value_and_grad of the mean-radiance
    MSE. Counted in primary rays/s of the fwd+bwd step."""
    import jax

    from rtweekend_tpu.grad import make_loss
    from rtweekend_tpu.models.builders import build_scene
    from rtweekend_tpu.parallel.shard import extract_params
    from rtweekend_tpu.render import camera_for_scene

    w, h, spp, depth = 400, 225, 4, 16
    scene = build_scene("final_scene")
    camera = camera_for_scene("final_scene", aspect_ratio=w / h)
    params = extract_params(scene)
    target = jnp.zeros((h, w, 3), jnp.float32)
    loss_fn = make_loss(
        scene, camera, target, (0.7, 0.8, 1.0), jnp.uint32(7),
        width=w, height=h, spp=spp, max_depth=depth, use_pallas=True,
    )
    vg = jax.jit(jax.value_and_grad(loss_fn))
    loss, grads = vg(params)  # compile
    ok = float(loss)
    assert np.isfinite(ok)
    t0 = time.perf_counter()
    loss, grads = vg(params)
    _ = float(loss) + float(jnp.sum(grads["c0"]))
    dt = time.perf_counter() - t0
    return round(w * h * spp / dt)


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

    result = {
        "metric": "rays_per_s_chip_final_scene_1200x675",
        "value": round(rays_per_s, 1),
        "unit": "primary_rays/s",
        "vs_baseline": round(rays_per_s / baseline, 3),
    }
    result.update(_roofline(scene, dt, n_rays, rays_per_s))
    try:
        result["fwd_bwd_rays_per_s"] = _bench_fwd_bwd()
    except Exception as e:  # never let the grad bench kill the headline
        result["fwd_bwd_error"] = str(e)[:120]
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
