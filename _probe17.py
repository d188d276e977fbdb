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
b = jnp.arange(n, dtype=jnp.uint32)
x = jnp.linspace(0, 1, n)

if mode == "u32_to_f32":
    out = jax.jit(lambda b: (b >> jnp.uint32(8)).astype(jnp.float32) * (2.0**-24))(b)
elif mode == "stack_slice":
    out = jax.jit(lambda x: jnp.stack([x, x + 1, x + 2, x + 3], axis=-1)[:, 2])(x)
elif mode == "uniform4_slice":
    from rtweekend_tpu.utils import rng as rng_mod
    pix = jnp.arange(n, dtype=jnp.int32)
    smp = jnp.zeros(n, jnp.int32)
    out = jax.jit(
        lambda s, p, m: rng_mod.uniform4(s, p, m, rng_mod.STREAM_CAMERA0)[:, 2] * 2.0
    )(jnp.uint32(42), pix, smp)
elif mode == "uniform4_plain":
    from rtweekend_tpu.utils import rng as rng_mod
    pix = jnp.arange(n, dtype=jnp.int32)
    smp = jnp.zeros(n, jnp.int32)
    out = jax.jit(rng_mod.uniform4)(jnp.uint32(42), pix, smp, rng_mod.STREAM_CAMERA0)
jax.block_until_ready(out)

timeit("nonzero AFTER", nz, al, size=K)
