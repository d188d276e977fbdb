import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import functools
import jax, jax.numpy as jnp

stage = sys.argv[1] if len(sys.argv) > 1 else "bare"

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
    print(f"[{stage}] {name:36s} {best*1000:8.2f} ms")
    return r

al = jax.random.bernoulli(jax.random.PRNGKey(1), 0.35, (M,)).astype(jnp.float32)
jax.block_until_ready(al)

timeit("nonzero BEFORE", nz, al, size=K)

if stage == "import":
    import rtweekend_tpu.ops.pallas.megakernel as mk  # noqa
elif stage == "scene":
    from rtweekend_tpu.models.builders import build_scene
    scene = build_scene("final_scene")
    jax.block_until_ready(jax.tree.leaves(scene))
elif stage == "pallas":
    from rtweekend_tpu.models.builders import build_scene
    from rtweekend_tpu.render import camera_for_scene, _gen_batch_rays
    import rtweekend_tpu.ops.pallas.megakernel as mk
    scene = build_scene("final_scene")
    cam = camera_for_scene("final_scene", aspect_ratio=1200/675)
    o, d, t, pix, smp = _gen_batch_rays(cam, jnp.uint32(42), jnp.int32(0), width=1200, height=675, n_samples=5)
    st = mk._init_state(o, d, t, pix, smp)
    rad, st2 = mk._trace_segment(scene, st, jnp.uint32(42), jnp.asarray((0.7,0.8,1.0), jnp.float32), jnp.int32(0), 2)
    jax.block_until_ready(rad)
elif stage == "trivial_pallas":
    from jax.experimental import pallas as pl
    def k(x_ref, o_ref):
        o_ref[0] = x_ref[0] * 2.0
    x = jnp.ones((1, 8, 128), jnp.float32)
    import jax.experimental.pallas.tpu as pltpu
    out = pl.pallas_call(
        k, grid=(1,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
    )(x)
    jax.block_until_ready(out)

timeit("nonzero AFTER", nz, al, size=K)
