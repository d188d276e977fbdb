import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import functools
import jax, jax.numpy as jnp
from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.render import camera_for_scene, _gen_batch_rays
import rtweekend_tpu.ops.pallas.megakernel as mk

mode = sys.argv[1] if len(sys.argv) > 1 else "big"

M = 4050944
K = 2097152

@functools.partial(jax.jit, static_argnames=("size",))
def nz(al, *, size):
    return jnp.nonzero(al > 0.5, size=size, fill_value=0)[0]

@jax.jit
def tiny(x):
    return x + 1.0

def timeit(name, f, *a, **kw):
    r = f(*a, **kw); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*a, **kw); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"[{mode}] {name:32s} {best*1000:8.2f} ms")
    return r

al = jax.random.bernoulli(jax.random.PRNGKey(1), 0.35, (M,)).astype(jnp.float32)
small = jnp.ones((8, 128), jnp.float32)
jax.block_until_ready([al, small])

timeit("nonzero BEFORE", nz, al, size=K)
timeit("tiny BEFORE", tiny, small)

scene = build_scene("final_scene")
cam = camera_for_scene("final_scene", aspect_ratio=1200/675)
bg = jnp.asarray((0.7, 0.8, 1.0), jnp.float32)

if mode == "big":       # ~300ms kernel
    n_samples, seg = 5, 2
elif mode == "medium":  # ~30ms kernel: 1M rays 1 bounce
    n_samples, seg = 1, 1
else:                   # small: 64k rays, 1 bounce  (~2ms)
    n_samples, seg = 1, 1

W, H = (1200, 675) if mode != "small" else (256, 256)
o, d, t, pix, smp = _gen_batch_rays(cam, jnp.uint32(42), jnp.int32(0), width=W, height=H, n_samples=n_samples)
st = mk._init_state(o, d, t, pix, smp)
rad, _ = mk._trace_segment(scene, st, jnp.uint32(42), bg, jnp.int32(0), seg)
jax.block_until_ready(rad)

timeit("nonzero AFTER", nz, al, size=K)
timeit("tiny AFTER", tiny, small)
time.sleep(5)
timeit("nonzero AFTER sleep5", nz, al, size=K)
for i in range(50):
    jax.block_until_ready(tiny(small))
timeit("nonzero AFTER 50 tiny ops", nz, al, size=K)
