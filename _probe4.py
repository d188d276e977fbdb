import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
from rtweekend_tpu.ops.pallas import megakernel as mk

M = 4050944
K = 2097152
key = jax.random.PRNGKey(0)

state = {}
for name in mk._STATE_FIELDS:
    if name in ("pid", "sid"):
        state[name] = jax.random.randint(jax.random.fold_in(key, hash(name) % 1000), (M,), 0, 810000, dtype=jnp.int32)
    elif name == "al":
        state[name] = jax.random.bernoulli(key, 0.3, (M,)).astype(jnp.float32)
    else:
        state[name] = jax.random.normal(jax.random.fold_in(key, hash(name) % 997), (M,))
state["ray_id"] = jnp.arange(M, dtype=jnp.int32)
count = jnp.int32(jnp.sum(state["al"] > 0.5))
total = jnp.zeros((M, 3), jnp.float32)
rad = jax.random.normal(key, (M, 3))

def timeit(name, f, *a, **kw):
    r = f(*a, **kw); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*a, **kw); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1000:8.1f} ms")
    return r

timeit("mk._compact real fn synthetic input", mk._compact, state, count, size=K)
timeit("mk._scatter_rad real fn synthetic", mk._scatter_rad, jnp.zeros((M,3)), state["ray_id"], rad, state["al"])
