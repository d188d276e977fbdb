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
x = jnp.linspace(0, 1, n)
y = jnp.linspace(0, 1, n)

if mode == "disk":
    from rtweekend_tpu.utils.rng import in_unit_disk_from_u
    out = jax.jit(in_unit_disk_from_u)(x, y)
elif mode == "trig":
    out = jax.jit(lambda a, b: jnp.sqrt(a) * jnp.cos(2 * jnp.pi * b))(x, y)
elif mode == "stack":
    @jax.jit
    def f(a, b):
        r = jnp.sqrt(a)
        th = (2.0 * jnp.pi) * b
        return jnp.stack([r * jnp.cos(th), r * jnp.sin(th), jnp.zeros_like(r)], axis=-1)
    out = f(x, y)
elif mode == "dataclass":
    from rtweekend_tpu.ops.camera import make_camera
    cam = make_camera((13,2,3), (0,0,0), (0,1,0), 20.0, 16/9, 0.1, 10.0)
    out = jax.jit(lambda c, a: a * c.lens_radius + c.origin[None, :].sum())(cam, x)
elif mode == "bcast":
    from rtweekend_tpu.ops.camera import make_camera
    cam = make_camera((13,2,3), (0,0,0), (0,1,0), 20.0, 16/9, 0.1, 10.0)
    @jax.jit
    def f(c, s, t):
        rd = jnp.stack([s, t, jnp.zeros_like(s)], axis=-1) * c.lens_radius
        offset = c.u[None, :] * rd[:, :1] + c.v[None, :] * rd[:, 1:2]
        dirs = (c.lower_left[None, :] + s[:, None] * c.horizontal[None, :]
                + t[:, None] * c.vertical[None, :] - c.origin[None, :] - offset)
        return c.origin[None, :] + offset, dirs
    out = f(cam, x, y)
jax.block_until_ready(out)

timeit("nonzero AFTER", nz, al, size=K)
