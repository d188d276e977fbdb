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

from rtweekend_tpu.ops.camera import make_camera, generate_rays
from rtweekend_tpu.utils import rng as rng_mod

cam = make_camera((13,2,3), (0,0,0), (0,1,0), 20.0, 16/9, 0.1, 10.0)
n = 65536 if mode != "tiny" else 1024
pix = jnp.arange(n, dtype=jnp.int32)
smp = jnp.zeros(n, jnp.int32)
seed = jnp.uint32(42)

if mode in ("genrays", "tiny", "repro2"):
    out = jax.jit(functools.partial(generate_rays, width=256, height=256))(
        cam, pixel_ids=pix, sample_ids=smp, seed=seed)
elif mode == "uni_disk":
    @jax.jit
    def f(cam, pix, smp, seed):
        u0 = rng_mod.uniform4(seed, pix, smp, rng_mod.STREAM_CAMERA0)
        rd = rng_mod.in_unit_disk_from_u(u0[:, 2], u0[:, 3]) * cam.lens_radius
        return rd
    out = f(cam, pix, smp, seed)
elif mode == "uni_bcast":
    @jax.jit
    def f(cam, pix, smp, seed):
        dtype = cam.origin.dtype
        i = (pix % 256).astype(dtype)
        j = (pix // 256).astype(dtype)
        u0 = rng_mod.uniform4(seed, pix, smp, rng_mod.STREAM_CAMERA0)
        s = (i + u0[:, 0]) / 255.0
        t = (j + u0[:, 1]) / 255.0
        dirs = (cam.lower_left[None, :] + s[:, None] * cam.horizontal[None, :]
                + t[:, None] * cam.vertical[None, :] - cam.origin[None, :])
        return dirs
    out = f(cam, pix, smp, seed)
elif mode == "no_time":
    @jax.jit
    def f(cam, pix, smp, seed):
        dtype = cam.origin.dtype
        i = (pix % 256).astype(dtype)
        j = (pix // 256).astype(dtype)
        u0 = rng_mod.uniform4(seed, pix, smp, rng_mod.STREAM_CAMERA0)
        s = (i + u0[:, 0]) / 255.0
        t = (j + u0[:, 1]) / 255.0
        rd = rng_mod.in_unit_disk_from_u(u0[:, 2], u0[:, 3]) * cam.lens_radius
        offset = cam.u[None, :] * rd[:, :1] + cam.v[None, :] * rd[:, 1:2]
        origins = cam.origin[None, :] + offset
        dirs = (cam.lower_left[None, :] + s[:, None] * cam.horizontal[None, :]
                + t[:, None] * cam.vertical[None, :] - cam.origin[None, :] - offset)
        return origins, dirs
    out = f(cam, pix, smp, seed)
jax.block_until_ready(out)

timeit("nonzero AFTER", nz, al, size=K)
