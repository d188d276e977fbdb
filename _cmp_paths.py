import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.render import camera_for_scene, render

W,H,SPP,DEPTH = 1200,675,20,50
scene = build_scene("final_scene")
cam = camera_for_scene("final_scene", aspect_ratio=W/H)
bg = (0.70,0.80,1.00)
kw = dict(width=W,height=H,samples_per_pixel=SPP,max_depth=DEPTH,background=bg,seed=42,rays_per_chunk=1<<22)

for name,up in [("pallas",True),("jnp",False)]:
    render(scene,cam,samples_per_pixel=1,width=W,height=H,max_depth=DEPTH,background=bg,seed=42,rays_per_chunk=1<<22,use_pallas=up).block_until_ready()
    t0=time.perf_counter()
    render(scene,cam,use_pallas=up,**kw).block_until_ready()
    dt=time.perf_counter()-t0
    print(f"{name}: {dt:.2f}s  {W*H*SPP/dt/1e6:.3f} Mrays/s")
