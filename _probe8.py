import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import functools
import numpy as np
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

K = 2097152

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
    print(f"{name:44s} {best*1000:8.2f} ms")
    return r

al_real = st["al"]
al_host = jnp.asarray(np.asarray(al_real))          # host round-trip
al_stats = jax.random.bernoulli(jax.random.PRNGKey(1), float(al_real.mean()), al_real.shape).astype(jnp.float32)
x_real = st["ox"]
x_host = jnp.asarray(np.asarray(x_real))
x_const = jnp.ones_like(x_real)
jax.block_until_ready([al_host, al_stats, x_host, x_const])

idx_real = timeit("nonzero real alive", nz, al_real, size=K)
idx_host = timeit("nonzero host-roundtrip alive", nz, al_host, size=K)
idx_stats = timeit("nonzero bernoulli same density", nz, al_stats, size=K)
timeit("gather real ox / real idx", gather_one, x_real, idx_real)
timeit("gather host ox / host idx", gather_one, x_host, idx_host)
timeit("gather const ox / real idx", gather_one, x_const, idx_real)
timeit("gather real ox / stats idx", gather_one, x_real, idx_stats)
print("alive mean:", float(al_real.mean()))
print("ox finite:", bool(jnp.isfinite(x_real).all()), "max:", float(jnp.abs(x_real).max()))
