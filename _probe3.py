import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import functools
import jax, jax.numpy as jnp

M = 4050944           # 3957 tiles of 1024 — driver's cap0
K = 2097152
grid = M // 1024
key = jax.random.PRNGKey(0)

tiled = [jax.random.normal(jax.random.fold_in(key, i), (grid, 8, 128)) for i in range(13)]
alive_t = jax.random.bernoulli(key, 0.3, (grid, 8, 128)).astype(jnp.float32)

def timeit(name, f, *a, **kw):
    r = f(*a, **kw); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(*a, **kw); jax.block_until_ready(r)
    print(f"{name:44s} {(time.perf_counter()-t0)*1000:8.1f} ms")
    return r

@functools.partial(jax.jit, static_argnames=("size",))
def compact_from_tiled(tiled, al_t, *, size):
    flat = [x.reshape(-1) for x in tiled]
    al = al_t.reshape(-1)
    idx = jnp.nonzero(al > 0.5, size=size, fill_value=0)[0]
    return [f[idx] for f in flat]

@functools.partial(jax.jit, static_argnames=("size",))
def compact_from_tiled_copy(tiled, al_t, *, size):
    # force materialization of the flat layout before gathering
    flat = [jax.lax.optimization_barrier(x.reshape(-1) + 0.0) for x in tiled]
    al = al_t.reshape(-1)
    idx = jnp.nonzero(al > 0.5, size=size, fill_value=0)[0]
    return [f[idx] for f in flat]

@jax.jit
def scatter_from_tiled(total, ids, rad_t):
    rad = jnp.stack([x.reshape(-1) for x in rad_t[:3]], axis=-1)
    return total.at[ids].add(rad, mode="drop")

total = jnp.zeros((M, 3), jnp.float32)
ids = jnp.arange(M, dtype=jnp.int32)

timeit("compact from tiled reshape", compact_from_tiled, tiled, alive_t, size=K)
timeit("compact from tiled w/ barrier copy", compact_from_tiled_copy, tiled, alive_t, size=K)
timeit("scatter from tiled rad", scatter_from_tiled, total, ids, tiled)
