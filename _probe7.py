import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import functools
import jax, jax.numpy as jnp

M = 4050944
K = 2097152
key = jax.random.PRNGKey(0)

x_rand = jax.random.normal(key, (M,))
al_rand = jax.random.bernoulli(key, 0.35, (M,)).astype(jnp.float32)
jax.block_until_ready([x_rand, al_rand])
print("random fmt:", x_rand.format.layout)

# same data, but round-tripped through a (grid,8,128) reshape executable
@jax.jit
def roundtrip(x):
    return x.reshape(-1, 8, 128).reshape(-1)
x_rt = roundtrip(x_rand)
al_rt = roundtrip(al_rand)
jax.block_until_ready([x_rt, al_rt])
print("roundtrip fmt:", x_rt.format.layout)

@functools.partial(jax.jit, static_argnames=("size",))
def nz(al, *, size):
    return jnp.nonzero(al > 0.5, size=size, fill_value=0)[0]

@jax.jit
def gather_one(x, idx):
    return x[idx]

def timeit(name, f, *a, **kw):
    r = f(*a, **kw); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*a, **kw); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1000:8.2f} ms")
    return r

idx1 = timeit("nonzero(random-layout alive)", nz, al_rand, size=K)
idx2 = timeit("nonzero(roundtrip alive)", nz, al_rt, size=K)
timeit("gather(random-layout)", gather_one, x_rand, idx1)
timeit("gather(roundtrip)", gather_one, x_rt, idx2)
timeit("gather(roundtrip x, random idx)", gather_one, x_rt, idx1)
timeit("gather(random x, roundtrip idx)", gather_one, x_rand, idx2)
print("idx fmt:", idx1.format.layout, idx2.format.layout)
