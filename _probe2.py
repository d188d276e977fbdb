import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import functools
import jax, jax.numpy as jnp
import numpy as np

M = 4 * 1024 * 1024
K = 2 * 1024 * 1024
NF = 14

key = jax.random.PRNGKey(0)
fields = [jax.random.normal(jax.random.fold_in(key, i), (M,)) for i in range(NF)]
stacked = jnp.stack(fields, axis=1)          # [M, NF]
alive = jax.random.bernoulli(key, 0.4, (M,))
count = jnp.int32(jnp.sum(alive))
total = jnp.zeros((M, 3), jnp.float32)
rad = jax.random.normal(key, (K, 3))
# sorted unique ids (as compaction produces)
ids = jnp.sort(jax.random.permutation(key, M)[:K])

def timeit(name, f, *a, **kw):
    r = f(*a, **kw); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(*a, **kw); jax.block_until_ready(r)
    print(f"{name:40s} {(time.perf_counter()-t0)*1000:8.1f} ms")
    return r

@functools.partial(jax.jit, static_argnames=("size",))
def compact_per_array(fields, al, *, size):
    idx = jnp.nonzero(al, size=size, fill_value=0)[0]
    return [f[idx] for f in fields]

@functools.partial(jax.jit, static_argnames=("size",))
def compact_stacked(st, al, *, size):
    idx = jnp.nonzero(al, size=size, fill_value=0)[0]
    return st[idx]

@functools.partial(jax.jit, static_argnames=("size",))
def compact_stacked_sorted_flag(st, al, *, size):
    idx = jnp.nonzero(al, size=size, fill_value=0)[0]
    return jax.lax.gather(
        st, idx[:, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,)),
        slice_sizes=(1, st.shape[1]),
        indices_are_sorted=True, unique_indices=True, mode="fill")

@jax.jit
def compact_sort(fields, al):
    # stable sort by dead-flag: alive rows first, variadic payload
    keys = (~al).astype(jnp.int32)
    out = jax.lax.sort((keys,) + tuple(fields), num_keys=1, is_stable=True)
    return out[1:]

@jax.jit
def scatter_plain(total, ids, rad):
    return total.at[ids].add(rad, mode="drop")

@jax.jit
def scatter_sorted(total, ids, rad):
    return total.at[ids].add(
        rad, mode="drop", indices_are_sorted=True, unique_indices=True)

timeit("compact per-array gather (14)", compact_per_array, fields, alive, size=K)
timeit("compact stacked [M,14] row gather", compact_stacked, stacked, alive, size=K)
timeit("compact stacked sorted/unique flags", compact_stacked_sorted_flag, stacked, alive, size=K)
timeit("compact via stable variadic sort", compact_sort, fields, alive)
timeit("scatter-add plain", scatter_plain, total, ids, rad)
timeit("scatter-add sorted+unique", scatter_sorted, total, ids, rad)
