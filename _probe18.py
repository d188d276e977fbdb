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

if mode == "capture_device_const":
    DEV_CONST = jnp.uint32(0xC0FFEE00)          # device array at module scope
    out = jax.jit(lambda p: p.astype(jnp.uint32) * DEV_CONST)(pix)
elif mode == "python_int_const":
    C = 0xC0FFEE00
    out = jax.jit(lambda p: p.astype(jnp.uint32) * jnp.uint32(C))(pix)
elif mode == "d2h_only":
    DEV = jnp.uint32(0xC0FFEE00)
    jax.block_until_ready(DEV)
    import numpy as np
    _ = np.asarray(DEV)   # explicit D2H
    out = jax.jit(lambda p: p * 2)(pix)
jax.block_until_ready(out)

timeit("nonzero AFTER", nz, al, size=K)
