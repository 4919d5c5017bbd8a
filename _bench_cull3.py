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

def bench(label, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n
    print(f"{label:44s} {dt*1e3:9.2f} ms")
    return out

tb = jnp.full((R,), TC.INF)
for SUB in (8, 16, 32):
    nb = R // (SUB * 128)
    lists, counts = TC.block_leaf_lists(bvh, ro, rd, tb, SUB * 128)
    lists = jax.block_until_ready(lists)
    counts = jax.block_until_ready(counts)
    print(f"SUB={SUB} nb={nb} counts mean {np.asarray(counts).mean():.1f} max {np.asarray(counts).max()}")
    planes7 = tuple(jax.block_until_ready(p.reshape(nb * SUB, 128))
                    for p in (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2], tb))
    for tag, cts in (("real", counts), ("zero", counts * 0), ("one", counts * 0 + 1)):
        cts = jax.block_until_ready(cts)
        f = lambda: TC._sweep_pallas(planes7, lists, cts, bvh.planes,
                                     m_occ=bvh.m_occ, t_min=1e-4, sub=SUB)
        bench(f"  sweep SUB={SUB} counts={tag}", lambda *_: f())
