import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import functools
import jax, jax.numpy as jnp
from rtweekend_tpu.models.builders import build_scene
from rtweekend_tpu.render import camera_for_scene, _gen_batch_rays
from rtweekend_tpu.ops.pallas import megakernel as mk

W, H, SPP = 1200, 675, 5
scene = build_scene("final_scene")
cam = camera_for_scene("final_scene", aspect_ratio=W / H)
bg = jnp.asarray((0.70, 0.80, 1.00), jnp.float32)
seed = jnp.uint32(42)
o, d, t, pix, smp = _gen_batch_rays(cam, seed, jnp.int32(0), width=W, height=H, n_samples=SPP)

state = mk._init_state(o, d, t, pix, smp)
rad, st = mk._trace_segment(scene, state, seed, bg, jnp.int32(0), 2)
jax.block_until_ready(rad)
st["ray_id"] = jnp.arange(st["ox"].shape[0], dtype=jnp.int32)

print("pallas-out format:", st["ox"].format)
print("synthetic  format:", jnp.zeros_like(st["ox"]).format)
print("passthrough format:", st["tm"].format)

count = jnp.int32(jnp.sum(st["al"] > 0.5))
print("count:", int(count))

@functools.partial(jax.jit, static_argnames=("size",))
def compact(state, count, *, size):
    alive = state["al"] > 0.5
    idx = jnp.nonzero(alive, size=size, fill_value=0)[0]
    keep = (jnp.arange(size, dtype=jnp.int32) < count) & alive[idx]
    out = {k: v[idx] for k, v in state.items()}
    out["al"] = keep.astype(jnp.float32)
    return out

def timeit(name, f, *a, **kw):
    r = f(*a, **kw); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*a, **kw); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1000:8.1f} ms")
    return r

timeit("compact on real pallas outputs", compact, st, count, size=2097152)

# force fresh default-layout copies
st2 = {k: jnp.asarray(v).copy() for k, v in st.items()}
jax.block_until_ready(st2)
timeit("compact on copied state", compact, st2, count, size=2097152)

# nonzero alone on real alive
@functools.partial(jax.jit, static_argnames=("size",))
def nz(al, *, size):
    return jnp.nonzero(al > 0.5, size=size, fill_value=0)[0]
timeit("nonzero on real alive", nz, st["al"], size=2097152)
timeit("nonzero on copied alive", nz, st2["al"], size=2097152)

idx = nz(st2["al"], size=2097152)
@jax.jit
def gather_one(x, idx):
    return x[idx]
timeit("gather one real field", gather_one, st["ox"], idx)
timeit("gather one copied field", gather_one, st2["ox"], idx)
