import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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

x = jnp.ones((4, 8, 128), jnp.float32)

if mode == "fori":
    def k(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[0]
        o_ref[0] = jax.lax.fori_loop(0, 10, body, jnp.zeros_like(x_ref[0]))
elif mode == "cond":
    def k(x_ref, o_ref):
        v = x_ref[0]
        o_ref[0] = jax.lax.cond(jnp.max(v) > 0.5, lambda: v * 2.0, lambda: v)
elif mode == "trans":
    def k(x_ref, o_ref):
        v = x_ref[0]
        o_ref[0] = jnp.sin(v) + jnp.log1p(jnp.abs(v)) + jnp.exp(-v) + jnp.sqrt(jnp.abs(v))
elif mode == "uint":
    def k(x_ref, o_ref):
        v = x_ref[0]
        b = pltpu.bitcast(v, jnp.int32)
        u = pltpu.bitcast(b, jnp.uint32)
        u = u * jnp.uint32(1664525) + jnp.uint32(1013904223)
        u ^= u >> jnp.uint32(16)
        o_ref[0] = pltpu.bitcast(u >> jnp.uint32(8), jnp.int32).astype(jnp.float32)
elif mode == "fori_cond":
    def k(x_ref, o_ref):
        def body(i, acc):
            return jax.lax.cond(jnp.max(acc) < 1e9, lambda: acc + x_ref[0], lambda: acc)
        o_ref[0] = jax.lax.fori_loop(0, 10, body, jnp.zeros_like(x_ref[0]))

out = pl.pallas_call(
    k, grid=(4,),
    in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))],
    out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
)(x)
jax.block_until_ready(out)

timeit("nonzero AFTER", nz, al, size=K)
