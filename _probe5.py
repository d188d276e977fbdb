import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.render import camera_for_scene, _gen_batch_rays
from rtweekend_tpu.ops.pallas import megakernel as mk

W, H, SPP = 1200, 675, 5
scene = build_scene("final_scene")
cam = camera_for_scene("final_scene", aspect_ratio=W / H)
bg = jnp.asarray((0.70, 0.80, 1.00), jnp.float32)
seed = jnp.uint32(42)
o, d, t, pix, smp = _gen_batch_rays(cam, seed, jnp.int32(0), width=W, height=H, n_samples=SPP)
jax.block_until_ready(o)

def run(max_depth=50, schedule=(2, 1, 1, 2, 4, 8), verbose=False):
    n = o.shape[0]
    state = mk._init_state(o, d, t, pix, smp)
    state["ray_id"] = jnp.arange(state["ox"].shape[0], dtype=jnp.int32)
    total = jnp.zeros((n, 3), jnp.float32)
    b = 0
    seg_iter = iter(schedule)
    cap = state["ox"].shape[0]
    count = cap
    count_dev = jnp.int32(cap)
    while b < max_depth:
        seg = min(next(seg_iter, 16), max_depth - b)
        out_cap = min(cap, mk._pow2_tiles(max(count, 1)))
        t0 = time.perf_counter()
        total, state, count_dev = mk._segment_fused(
            scene, state, total, seed, bg, jnp.int32(b), count_dev,
            seg, out_cap, mk.T_MIN, False)
        jax.block_until_ready(total)
        if verbose:
            print(f"seg b={b:2d} n={seg:2d} cap={cap:8d}->{out_cap:8d}  {(time.perf_counter()-t0)*1000:8.1f} ms")
        cap = out_cap
        b += seg
        if b >= max_depth:
            break
        count = int(count_dev)
        if count == 0:
            break
    return total

run()
t0 = time.perf_counter()
run(verbose=True)
print(f"total batch: {(time.perf_counter()-t0)*1000:.0f} ms")
t0 = time.perf_counter()
run()
print(f"uninstrumented batch: {(time.perf_counter()-t0)*1000:.0f} ms")
