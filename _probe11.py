import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

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
    return r

al = jax.random.bernoulli(jax.random.PRNGKey(1), 0.35, (M,)).astype(jnp.float32)
jax.block_until_ready(al)
timeit("nonzero BEFORE", nz, al, size=K)

def k(x_ref, o_ref):
    o_ref[0] = x_ref[0] * 2.0

x = jnp.ones((4, 8, 128), jnp.float32)
kwargs = dict(
    grid=(4,),
    in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))],
    out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
)
if mode == "cost_small":
    kwargs["cost_estimate"] = pl.CostEstimate(flops=1000, bytes_accessed=4096, transcendentals=0)
elif mode == "cost_big":
    kwargs["cost_estimate"] = pl.CostEstimate(
        flops=4050944 * 50 * (496 * 25 + 150),
        bytes_accessed=4050944 * 26 * 4,
        transcendentals=4050944 * 50 * 12)
elif mode == "smem":
    def k(s_ref, x_ref, o_ref):
        o_ref[0] = x_ref[0] * s_ref[0]
    import jax.experimental.pallas.tpu as pltpu
    kwargs["in_specs"] = [pl.BlockSpec(memory_space=pltpu.SMEM)] + kwargs["in_specs"]

if mode == "smem":
    s = jnp.ones((1,), jnp.float32)
    out = pl.pallas_call(k, **kwargs)(s, x)
else:
    out = pl.pallas_call(k, **kwargs)(x)
jax.block_until_ready(out)

timeit("nonzero AFTER", nz, al, size=K)
