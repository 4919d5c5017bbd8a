import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.models.scenes import bunny
from offline_raytracer_tpu.ops import traverse_pallas as TP
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

k = jax.random.PRNGKey(1)
row = bvh.child_rows[0]
wmin = jnp.minimum(row[0:3], row[6:9]); wmax = jnp.maximum(row[3:6], row[9:12])
ro_i = jax.random.uniform(k, (R, 3)) * (wmax - wmin) + wmin
rd_i = jax.random.normal(jax.random.PRNGKey(2), (R, 3))
rd_i = jax.block_until_ready(rd_i / jnp.linalg.norm(rd_i, axis=-1, keepdims=True))
ro_i = jax.block_until_ready(ro_i)

def bench(label, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n
    print(f"{label:40s} {dt*1e3:9.2f} ms   {R/dt/1e6:8.2f} Mrays/s")
    return out

pallas_hit = jax.jit(lambda ro, rd: TP.bvh_hit_ts_pallas(bvh, ro, rd, 1e-4))
cull_hit = jax.jit(lambda ro, rd: TC.bvh_hit_ts_cull(bvh, ro, rd, 1e-4))

t1, s1 = bench("packet coherent", pallas_hit, ro, rd)
t2, s2 = bench("cull coherent", cull_hit, ro, rd)
h1 = np.asarray(s1) >= 0; h2 = np.asarray(s2) >= 0
assert (h1 == h2).all(), (h1.sum(), h2.sum())
m = h1
assert np.allclose(np.asarray(t1)[m], np.asarray(t2)[m], rtol=1e-5)
print("  parity OK,", m.sum(), "hits")

t1, s1 = bench("packet incoherent", pallas_hit, ro_i, rd_i, n=2)
t2, s2 = bench("cull incoherent", cull_hit, ro_i, rd_i)
h1 = np.asarray(s1) >= 0; h2 = np.asarray(s2) >= 0
assert (h1 == h2).all()
print("  parity OK,", h1.sum(), "hits")

anyhit_p = jax.jit(lambda ro, rd: TP.bvh_hit_ts_pallas(bvh, ro, rd, 1e-4, t_far=jnp.full((R,), 10.0), any_hit=True))
anyhit_c = jax.jit(lambda ro, rd: TC.bvh_hit_ts_cull(bvh, ro, rd, 1e-4, t_far=jnp.full((R,), 10.0), any_hit=True))
o1 = bench("packet anyhit coherent", anyhit_p, ro, rd)
o2 = bench("cull anyhit coherent", anyhit_c, ro, rd)
assert ((np.asarray(o1[1]) >= 0) == (np.asarray(o2[1]) >= 0)).all()
print("  anyhit parity OK")
