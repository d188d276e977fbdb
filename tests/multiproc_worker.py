"""Worker for the real multi-process collective test
(tests/test_multiprocess.py): one OS process per 'host', CPU backend,
jax.distributed over a localhost coordinator — the same code path a TPU
pod runs (jax.distributed.initialize + shard_map over the global mesh +
psum + process_allgather), minus the ICI.

Usage: python multiproc_worker.py <coordinator> <num_procs> <pid> <out>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    coordinator, num_procs, pid, out_path = sys.argv[1:5]
    num_procs, pid = int(num_procs), int(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:  # CPU cross-process collectives ride Gloo where configurable
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    import numpy as np

    from rtweekend_tpu.parallel import multihost

    multihost.initialize(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs, jax.process_count()

    from rtweekend_tpu.models.builders import build_scene
    from rtweekend_tpu.parallel.shard import render_sharded
    from rtweekend_tpu.render import camera_for_scene

    w = h = 16
    spp, depth = 2, 2
    scene = build_scene("two_spheres")
    camera = camera_for_scene("two_spheres", aspect_ratio=1.0)
    bg = (0.7, 0.8, 1.0)

    mesh = multihost.global_mesh(samples_axis=1)
    fb = render_sharded(scene, camera, w, h, spp, depth, bg, 42, mesh)
    full = multihost.gather_framebuffer(fb)

    if pid == 0:
        np.save(out_path, full)
    # all processes must reach the end together (collectives block)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
