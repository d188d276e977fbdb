import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import functools
import jax, jax.numpy as jnp

mode = sys.argv[1]
M = 4050944
K = 2097152

@functools.partial(jax.jit, static_argnames=("size",))
def nz(al, *, size):
    return jnp.nonzero(al > 0.5, size=size, fill_value=0)[0]

def timeit(name, f, *a, **kw):
    r = f(*a, **kw); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*a, **kw); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"[{mode}] {name:28s} {best*1000:8.2f} ms")

al = jax.random.bernoulli(jax.random.PRNGKey(1), 0.35, (M,)).astype(jnp.float32)
jax.block_until_ready(al)
timeit("nonzero BEFORE", nz, al, size=K)

from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.render import camera_for_scene, _gen_batch_rays
import rtweekend_tpu.ops.pallas.megakernel as mk

scene = build_scene("final_scene")
cam = camera_for_scene("final_scene", aspect_ratio=1200/675)
bg = jnp.asarray((0.7, 0.8, 1.0), jnp.float32)
jax.block_until_ready(jax.tree.leaves(scene))

if mode in ("raygen", "init", "pack", "kernel"):
    o, d, t, pix, smp = _gen_batch_rays(cam, jnp.uint32(42), jnp.int32(0), width=256, height=256, n_samples=1)
    jax.block_until_ready(o)
if mode in ("init", "pack", "kernel"):
    st = mk._init_state(o, d, t, pix, smp)
    jax.block_until_ready(jax.tree.leaves(st))
if mode == "pack":
    packed = jax.jit(mk._pack_scene)(scene)
    jax.block_until_ready(packed)
if mode == "kernel":
    rad, _ = mk._trace_segment(scene, st, jnp.uint32(42), bg, jnp.int32(0), 1)
    jax.block_until_ready(rad)

timeit("nonzero AFTER", nz, al, size=K)
