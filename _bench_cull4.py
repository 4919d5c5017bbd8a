import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

LANE = 128
SUB = 8
R = 1 << 16
nb = R // (SUB * LANE)

planes = jnp.zeros((12, 544, 128), jnp.float32)
rays = tuple(jnp.ones((nb * SUB, LANE), jnp.float32) for _ in range(7))
lists = jnp.zeros((nb, 1, 640), jnp.int32)
counts = jnp.zeros((nb, 1, 1), jnp.int32)

def bench(label, fn, n=20):
    out = jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn())
    dt = (time.time() - t0) / n
    print(f"{label:52s} {dt*1e3:9.3f} ms")

ray_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
list_spec = pl.BlockSpec((1, 1, 640), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
count_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
coeff_spec = pl.BlockSpec((12, 544, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)

def k_noop(*refs):
    refs[-2][:] = refs[0][:]
    refs[-1][:] = jnp.zeros_like(refs[-1])

out_shape = [jax.ShapeDtypeStruct((nb * SUB, LANE), jnp.float32),
             jax.ShapeDtypeStruct((nb * SUB, LANE), jnp.int32)]

@jax.jit
def noop_full():
    return pl.pallas_call(k_noop, grid=(nb,),
        in_specs=[ray_spec] * 7 + [list_spec, count_spec, coeff_spec],
        out_specs=[ray_spec, ray_spec], out_shape=out_shape,
    )(*rays, lists, counts, planes)
bench("noop, all inputs (planes VMEM every step)", noop_full)

@jax.jit
def noop_rays_only():
    return pl.pallas_call(k_noop, grid=(nb,),
        in_specs=[ray_spec] * 7,
        out_specs=[ray_spec, ray_spec], out_shape=out_shape,
    )(*rays)
bench("noop, rays only", noop_rays_only)

@jax.jit
def noop_rays_smem():
    return pl.pallas_call(k_noop, grid=(nb,),
        in_specs=[ray_spec] * 7 + [list_spec, count_spec],
        out_specs=[ray_spec, ray_spec], out_shape=out_shape,
    )(*rays, lists, counts)
bench("noop, rays + smem lists", noop_rays_smem)

@jax.jit
def noop_planes_novmem():
    return pl.pallas_call(k_noop, grid=(nb,),
        in_specs=[ray_spec] * 7 + [list_spec, count_spec,
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[ray_spec, ray_spec], out_shape=out_shape,
    )(*rays, lists, counts, planes)
bench("noop, planes in ANY (no copy)", noop_planes_novmem)

# while loop of K dummy iterations, no planes
def k_loop(K, *refs):
    def body(c):
        i, acc = c
        return i + 1, acc + refs[0][:]
    _, acc = jax.lax.while_loop(lambda c: c[0] < K, body, (jnp.int32(0), refs[0][:]))
    refs[-2][:] = acc
    refs[-1][:] = jnp.zeros_like(refs[-1])

for K in (0, 8, 64):
    @jax.jit
    def loop_k(K=K):
        return pl.pallas_call(functools.partial(k_loop, K), grid=(nb,),
            in_specs=[ray_spec] * 7,
            out_specs=[ray_spec, ray_spec], out_shape=out_shape,
        )(*rays)
    bench(f"while x{K} trivial body, rays only", loop_k)
