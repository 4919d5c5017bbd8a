import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.models.scenes import bunny
from offline_raytracer_tpu.ops import traverse_cull as TC
from offline_raytracer_tpu.ops.camera import generate_rays
from offline_raytracer_tpu.utils import rng

W = H = 512
scene = bunny(width=W, height=H)
bvh = scene.tri_bvh
cfg = RenderConfig(width=W, height=H, spp=32, max_bounces=8, enable_dof=False)
R = 1 << 16
pixel_ids = jnp.arange(R, dtype=jnp.int32)
keys = rng.pixel_sample_keys(rng.render_key(0), pixel_ids, jnp.zeros((R,), jnp.int32))
ro, rd = generate_rays(scene.camera, cfg, pixel_ids, keys)
ro = jax.block_until_ready(ro); rd = jax.block_until_ready(rd)

def bench(label, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n
    print(f"{label:40s} {dt*1e3:9.2f} ms")
    return out

tb = jnp.full((R,), TC.INF)
lists_fn = jax.jit(lambda ro, rd: TC.block_leaf_lists(bvh, ro, rd, tb, 1024))
lists, counts = bench("cull+lists", lists_fn, ro, rd)
print("counts: mean", np.asarray(counts).mean(), "max", np.asarray(counts).max())

planes7 = tuple(jax.block_until_ready(p.reshape(64 * 8, 128))
                for p in (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2], tb))
lists = jax.block_until_ready(lists); counts = jax.block_until_ready(counts)
sweep = lambda: TC._sweep_pallas(planes7, lists, counts, bvh.planes,
                                 m_occ=bvh.m_occ, t_min=1e-4, sub=8)
bench("sweep only", lambda *_: sweep())

# cull only without argsort
@jax.jit
def cull_flags(ro, rd):
    lb = bvh.leaf_bounds
    inv = 1.0 / rd
    def axis_ts(k):
        t0 = (lb[k][None, :] - ro[:, k:k+1]) * inv[:, k:k+1]
        t1 = (lb[k+3][None, :] - ro[:, k:k+1]) * inv[:, k:k+1]
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)
    n0, f0 = axis_ts(0); n1, f1 = axis_ts(1); n2, f2 = axis_ts(2)
    tn = jnp.maximum(jnp.maximum(n0, n1), n2)
    tf = jnp.minimum(jnp.minimum(f0, f1), f2)
    wants = (tf >= jnp.maximum(tn, 0.0))
    return wants.reshape(64, 1024, -1).any(1)
flags = bench("cull flags only", cull_flags, ro, rd)

@jax.jit
def argsort_only(flags):
    L = flags.shape[1]
    iota = jnp.arange(L, dtype=jnp.int32)
    key = jnp.where(flags, iota[None], L + iota[None])
    return jnp.argsort(key, axis=1).astype(jnp.int32)
bench("argsort lists only", argsort_only, flags)
