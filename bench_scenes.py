"""Per-scene TPU throughput: every texture/geometry family on the fast
path (VERDICT r2 #7: the headline bench only exercises the sphere-heavy
book cover; noise (Perlin-in-kernel), image (VMEM atlas chunk walk),
and the all-rect enclosed Cornell box stress different kernel paths).

Emits one JSON line per scene and writes SCENES_BENCH_r04-style output
to stdout; redirect to commit an artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import time

_here = os.path.dirname(os.path.abspath(__file__))
_cache = os.path.join(_here, ".bench_cache")
if not os.path.isdir(_cache):
    _cache = os.path.join(_here, ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)

# (scene, width, height, spp, depth) — sized so each runs in seconds on
# one chip while keeping every kernel feature path hot.
CONFIGS = [
    ("cornell_box", 600, 600, 20, 50),        # all-rect, enclosed, emissive
    ("two_perlin_spheres", 600, 400, 20, 50), # kernel-native Perlin turbulence
    ("earth", 600, 400, 20, 50),              # VMEM image-atlas chunk walk
    ("golden_scene", 600, 400, 20, 50),       # 487 static spheres, gradient sky
    ("simple_light", 600, 400, 20, 50),       # rects + noise + emissive
]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--spp", type=int, default=None, help="override spp")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from rtweekend_tpu.config import SCENE_DEFAULTS
    from rtweekend_tpu.models.builders import build_scene
    from rtweekend_tpu.render import (
        adaptive_capacities,
        camera_for_scene,
        render,
    )

    results = []
    for name, w, h, spp, depth in CONFIGS:
        spp = args.spp or spp
        scene = build_scene(name)
        camera = camera_for_scene(name, aspect_ratio=w / h)
        bg = SCENE_DEFAULTS[name]["background"]
        caps = adaptive_capacities(name, bg, depth)
        kwargs = dict(
            width=w, height=h, samples_per_pixel=spp, max_depth=depth,
            background=bg, seed=42, rays_per_chunk=1 << 22, capacities=caps,
        )
        t_warm = time.perf_counter()
        warm = render(scene, camera, **kwargs)
        s = float(jnp.sum(warm))
        warm_s = time.perf_counter() - t_warm
        assert np.isfinite(s), f"{name}: non-finite radiance"
        t0 = time.perf_counter()
        out = render(scene, camera, **kwargs)
        _ = float(jnp.sum(out))
        dt = time.perf_counter() - t0
        n_rays = w * h * spp
        row = {
            "scene": name, "size": f"{w}x{h}", "spp": spp, "depth": depth,
            "rays_per_s": round(n_rays / dt), "exec_s": round(dt, 2),
            "compile_s": round(warm_s, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
