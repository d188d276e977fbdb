"""Headline benchmark: rays/s/chip on the 1200x675 book-cover final
scene (BASELINE.md north star; the reference publishes no numbers, so
vs_baseline compares against this repo's first recorded TPU result,
stored in BENCH_BASELINE.json).

Prints the headline JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
IMMEDIATELY after the timed render, then (budget permitting) an
enriched line with roofline + fwd/bwd numbers. The driver records the
tail of stdout, so a late timeout still yields a parsed headline —
the failure mode of rounds 3/4 (rc=124, nothing printed) cannot recur:
every expensive phase is budget-gated (BENCH_BUDGET_S, default 900 s)
and progress is logged to stderr.

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

# Prefer the COMMITTED bench cache (.bench_cache, regenerated whenever
# the kernels change) so a driver run starts warm: cold Mosaic compiles
# for the full bench measure ~300-400 s on the remote-TPU tunnel vs
# ~60-90 s warm. Falls back to the local dev cache.
_here = os.path.dirname(os.path.abspath(__file__))
_cache = os.path.join(_here, ".bench_cache")
if not os.path.isdir(_cache):
    _cache = os.path.join(_here, ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
# Cache every executable, not just slow-compiling ones: the bench's
# glue jits (ray-gen, accumulate) are cheap individually but add up
# cold on the remote tunnel.
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

_T0 = time.monotonic()
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "900"))


def _remaining():
    return _BUDGET - (time.monotonic() - _T0)


def _note(msg):
    print(f"[bench +{time.monotonic() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


_note(f"start (budget {_BUDGET:.0f}s, cache {_cache})")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

WIDTH, HEIGHT = 1200, 675
SPP_MEASURE = 40          # measured sample count; rays/s extrapolates
                          # (40 -> ~4.5 s timed window at 7M rays/s; same
                          # compiled executables as any multiple of 5)
MAX_DEPTH = 50
RAYS_PER_CHUNK = 1 << 22  # 5-spp wavefronts: best measured chunking
BASELINE_FILE = os.path.join(_here, "BENCH_BASELINE.json")

# MXU bf16 peak by device kind: the megakernel's closest-hit march runs
# on the MXU as [r_coef,128]@[128,128] matmuls (precision per
# megakernel._MARCH_PASSES bf16 passes). Peaks are the published
# per-chip bf16 numbers.
_MXU_PEAK_BF16 = {
    "TPU v5 lite": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
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


def _capacities():
    """The compaction schedule this bench renders with: the MEASURED
    adaptive schedule (alive-fraction probe on the CPU backend), exactly
    what render_image/the CLI give users for a known scene name — the
    static CAPS_OPEN fallback exists only for unnamed scenes. Cached per
    process, so the roofline accounting and the render agree."""
    from rtweekend_tpu.render import adaptive_capacities

    return adaptive_capacities(
        "final_scene", (0.70, 0.80, 1.00), MAX_DEPTH
    )


def _roofline(scene, dt, n_rays, rays_per_s, capacities):
    """MFU + speed-of-light accounting for the MXU closest-hit kernel.

    Per executed lane-bounce the kernel issues r_coef x 128 x 2
    single-pass MXU flops (one row of the 8 per-sublane
    [r_coef,128]@[128,128] dots, ops/pallas/megakernel.py), of which
    only the NF=17 real feature columns are useful — the rest is
    zero-padding to the 128-lane contraction. Both numbers are
    reported: mfu_pct counts what the silicon executed
    (x _MARCH_PASSES bf16 passes for the march precision),
    useful_mfu_pct counts only the non-padding fraction.

    Read useful_mfu_pct carefully: the K-dim zero padding costs NO
    wall-clock — MXU cycles scale with the M x N tile count (streaming
    r_coef rows), not with K occupancy, so shrinking K from 128 to 17
    would execute the same cycles (measured r5: K-packing schemes only
    ever INCREASE M and slow down). pct_of_sol — rays/s against the
    MXU saturating exactly the passes the compacted schedule issues —
    is the efficiency number that tracks real headroom."""
    import jax

    from rtweekend_tpu.ops.coeffs import NF
    from rtweekend_tpu.ops.pallas.megakernel import _MARCH_PASSES

    kind = jax.devices()[0].device_kind
    peak = _MXU_PEAK_BF16.get(kind)
    n_s = scene.spheres.radius.shape[0]
    n_r = scene.rects.k.shape[0]
    r_coef = 2 * n_s + 6 * n_r
    batch = max(1, RAYS_PER_CHUNK // (WIDTH * HEIGHT)) * WIDTH * HEIGHT
    n_batches = -(-n_rays // batch)
    lane_bounces = _executed_lane_bounces(
        batch, n_batches, MAX_DEPTH, capacities
    )
    raw = lane_bounces * r_coef * 128 * 2          # single-pass MXU flops
    executed = raw * _MARCH_PASSES                 # bf16 passes issued
    useful = lane_bounces * r_coef * NF * 2        # non-padding flops
    out = {
        "device_kind": kind,
        "exec_mxu_gflops_per_s": round(executed / dt / 1e9, 1),
        "mxu_flops_per_ray": round(executed / n_rays, 1),
        "useful_flops_per_ray": round(useful / n_rays, 1),
    }
    if peak:
        out["mxu_peak_bf16_tflops"] = round(peak / 1e12)
        out["mfu_pct"] = round(100.0 * executed / dt / peak, 2)
        out["useful_mfu_pct"] = round(100.0 * useful / dt / peak, 3)
        # speed-of-light: rays/s if the MXU were saturated on exactly
        # the bf16 passes the compacted schedule issues
        out["sol_rays_per_s"] = round(peak / (executed / n_rays))
        out["pct_of_sol"] = round(100.0 * rays_per_s / (peak / (executed / n_rays)), 2)
    return out


def _bench_fwd_bwd():
    """Gradient-step throughput: Pallas march + differentiable path
    replay (ops/pallas/vjp.py) through a value_and_grad of the
    mean-radiance MSE. Counted in primary rays/s of the fwd+bwd step."""
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
    _note("fwd_bwd compiled")
    # the FIRST post-compile step carries ~400ms of one-time layout/
    # donation work (measured: 766ms then stable 353ms); warm it off and
    # report the median of 3 steady-state steps.
    loss, grads = vg(params)
    _ = float(loss) + float(jnp.sum(grads["c0"]))
    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        loss, grads = vg(params)
        _ = float(loss) + float(jnp.sum(grads["c0"]))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    return round(w * h * spp / dt)


def main():
    from rtweekend_tpu.models.builders import build_scene
    from rtweekend_tpu.render import camera_for_scene, render

    _note("imports done")
    scene = build_scene("final_scene")
    camera = camera_for_scene("final_scene", aspect_ratio=WIDTH / HEIGHT)
    background = (0.70, 0.80, 1.00)

    caps = _capacities()  # measured adaptive schedule (CPU probe)
    _note(f"adaptive capacities: {caps}")
    kwargs = dict(
        width=WIDTH, height=HEIGHT, samples_per_pixel=SPP_MEASURE,
        max_depth=MAX_DEPTH, background=background, seed=42,
        rays_per_chunk=RAYS_PER_CHUNK, capacities=caps,
    )

    # warmup: compiles every executable at the measured shapes; the
    # scalar fetch forces completion (and drops the session into
    # synchronous dispatch, which is the honest mode to time). warmup_s
    # is the whole compile+first-execute cost — the driver-budget item
    # VERDICT r3 #1 asks to prove.
    _note("warmup render (compile) ...")
    t_warm = time.perf_counter()
    warm = render(scene, camera, **kwargs)
    wsum = float(jnp.sum(warm))
    warmup_s = time.perf_counter() - t_warm
    _note(f"warmup done in {warmup_s:.1f}s")
    assert np.isfinite(wsum), "warmup produced non-finite radiance"

    t0 = time.perf_counter()
    accum = render(scene, camera, **kwargs)
    total = float(jnp.sum(accum))  # forces real completion
    dt = time.perf_counter() - t0
    assert np.isfinite(total), "render produced non-finite radiance"
    _note(f"timed render done in {dt:.2f}s")

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
        "compile_s": round(warmup_s, 1),
        "exec_s": round(dt, 2),
    }
    # HEADLINE OUT, immediately — everything below is enrichment; if it
    # dies or the driver timeout lands mid-phase, this line is the tail.
    print(json.dumps(result), flush=True)

    try:
        result.update(_roofline(scene, dt, n_rays, rays_per_s, _capacities()))
    except Exception as e:
        result["roofline_error"] = str(e)[:120]

    if _remaining() > 240:
        _note(f"fwd_bwd bench ({_remaining():.0f}s budget left) ...")
        try:
            result["fwd_bwd_rays_per_s"] = _bench_fwd_bwd()
        except Exception as e:  # never let the grad bench kill the headline
            result["fwd_bwd_error"] = str(e)[:120]
        print(json.dumps(result), flush=True)
    else:
        _note("skipping fwd_bwd bench (budget)")
        print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
