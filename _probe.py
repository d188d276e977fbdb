import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.render import camera_for_scene, render

W, H, SPP, DEPTH = 1200, 675, 20, 50
scene = build_scene("final_scene")
cam = camera_for_scene("final_scene", aspect_ratio=W / H)
bg = (0.70, 0.80, 1.00)
kw = dict(width=W, height=H, samples_per_pixel=SPP, max_depth=DEPTH,
          background=bg, seed=42, rays_per_chunk=1 << 22)

t0 = time.perf_counter()
warm = render(scene, cam, **kw)
print(f"warmup dispatched (compiles) in {time.perf_counter()-t0:.1f}s", flush=True)
time.sleep(90)  # drain warmup execution without a poisoning D2H
print("drained; timing clean-mode run", flush=True)

t0 = time.perf_counter()
accum = render(scene, cam, **kw)
s = float(jnp.sum(accum))          # forces completion; poisons AFTER timing
dt = time.perf_counter() - t0
print(f"clean-mode: {dt:.2f}s  {W*H*SPP/dt/1e6:.3f} Mrays/s  sum={s:.1f}  nan={np.isnan(s)}")

t0 = time.perf_counter()
accum = render(scene, cam, **kw)
s = float(jnp.sum(accum))
dt = time.perf_counter() - t0
print(f"poisoned-mode: {dt:.2f}s  {W*H*SPP/dt/1e6:.3f} Mrays/s  sum={s:.1f}")
