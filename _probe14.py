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

n = 65536
pix = jnp.arange(n, dtype=jnp.int32)
smp = jnp.zeros(n, jnp.int32)
seed = jnp.uint32(42)

if mode == "camera":
    from rtweekend_tpu.ops.camera import make_camera
    cam = make_camera((13,2,3), (0,0,0), (0,1,0), 20.0, 16/9, 0.1, 10.0)
    jax.block_until_ready(cam.origin)
elif mode == "uniform4":
    from rtweekend_tpu.utils import rng as rng_mod
    u = jax.jit(rng_mod.uniform4)(seed, pix, smp, rng_mod.STREAM_CAMERA0)
    jax.block_until_ready(u)
elif mode == "repeat":
    @functools.partial(jax.jit, static_argnames=("ns",))
    def rep(start, *, ns):
        p = jnp.repeat(jnp.arange(65536, dtype=jnp.int32), ns)
        s = start + jnp.tile(jnp.arange(ns, dtype=jnp.int32), 65536)
        return p, s
    out = rep(jnp.int32(0), ns=1)
    jax.block_until_ready(out)
elif mode == "divmod":
    @jax.jit
    def dm(p):
        return (p % 1200).astype(jnp.float32), (p // 1200).astype(jnp.float32)
    jax.block_until_ready(dm(pix))
elif mode == "genrays":
    from rtweekend_tpu.ops.camera import make_camera, generate_rays
    cam = make_camera((13,2,3), (0,0,0), (0,1,0), 20.0, 16/9, 0.1, 10.0)
    out = jax.jit(functools.partial(generate_rays, width=256, height=256))(
        cam, pixel_ids=pix, sample_ids=smp, seed=seed)
    jax.block_until_ready(out)

timeit("nonzero AFTER", nz, al, size=K)
