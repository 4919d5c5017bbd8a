import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.models.scenes import bunny
from offline_raytracer_tpu.ops import traverse as T
from offline_raytracer_tpu.ops import traverse_pallas as TP
from offline_raytracer_tpu.ops.camera import generate_rays
from offline_raytracer_tpu.utils import rng

W = H = 512
scene = bunny(width=W, height=H)
bvh = scene.tri_bvh
print("BVH: n_leaves(p)=", bvh.n_leaves, "m_occ=", bvh.m_occ,
      "internal=", bvh.child_rows.shape, "planes=", bvh.planes.shape, file=sys.stderr)

cfg = RenderConfig(width=W, height=H, spp=32, max_bounces=8, enable_dof=False,
                   ray_batch=1 << 16)
R = 1 << 16
pixel_ids = jnp.arange(R, dtype=jnp.int32)
keys = rng.pixel_sample_keys(rng.render_key(0), pixel_ids, jnp.zeros((R,), jnp.int32))
ro, rd = generate_rays(scene.camera, cfg, pixel_ids, keys)
ro = jax.block_until_ready(ro); rd = jax.block_until_ready(rd)

# incoherent rays: random origins in bunny AABB, random dirs
k = jax.random.PRNGKey(1)
row = bvh.child_rows[0]
wmin = jnp.minimum(row[0:3], row[6:9]); wmax = jnp.maximum(row[3:6], row[9:12])
ro_i = jax.random.uniform(k, (R, 3)) * (wmax - wmin) + wmin
rd_i = jax.random.normal(jax.random.PRNGKey(2), (R, 3))
rd_i = rd_i / jnp.linalg.norm(rd_i, axis=-1, keepdims=True)
ro_i = jax.block_until_ready(ro_i); rd_i = jax.block_until_ready(rd_i)

def bench(label, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n
    print(f"{label:40s} {dt*1e3:9.1f} ms   {R/dt/1e6:8.2f} Mrays/s")
    return out

pallas_hit = jax.jit(lambda ro, rd: TP.bvh_hit_ts_pallas(bvh, ro, rd, 1e-4))
jnp_hit = jax.jit(lambda ro, rd: T.bvh_hit_ts(bvh, ro, rd, 1e-4))

bench("pallas coherent (camera)", pallas_hit, ro, rd)
bench("pallas incoherent", pallas_hit, ro_i, rd_i)
sorted_hit = jax.jit(lambda ro, rd: T._sorted_tri_hit(bvh, TP.bvh_hit_ts_pallas, cfg, ro, rd))
bench("pallas incoherent+sort", sorted_hit, ro_i, rd_i)

anyhit = jax.jit(lambda ro, rd: TP.bvh_hit_ts_pallas(bvh, ro, rd, 1e-4, t_far=jnp.full((R,), 10.0), any_hit=True))
bench("pallas anyhit incoherent", anyhit, ro_i, rd_i)

# full render launch: 1 spp chunk
from offline_raytracer_tpu.render import render_block_jit
f = lambda: render_block_jit(scene, cfg, pixel_ids, 0, 1)
bench("full render_block 64k rays 1spp", lambda *_: f(), n=3)
