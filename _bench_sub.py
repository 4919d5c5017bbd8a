import os, time, functools
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

# bounce-like rays too
from offline_raytracer_tpu.ops import traverse_pallas as TP
t_true, slot = TP.bvh_hit_ts_pallas(bvh, ro, rd, 1e-4)
x = ro + (t_true[:, None] - 1e-4) * rd
valid = slot >= 0
rd2 = jax.random.normal(jax.random.PRNGKey(3), (R, 3))
rd2 = rd2 / jnp.linalg.norm(rd2, axis=-1, keepdims=True)
ro2 = jnp.where(valid[:, None], x, 1e8)

def timed(fn, *args, n=3):
    np.asarray(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = np.asarray(fn(*args))
    return (time.time() - t0) / n

def amort(label, make_fn, k1=1, k2=5):
    t1 = timed(make_fn(k1)); t2 = timed(make_fn(k2))
    per = (t2 - t1) / (k2 - k1)
    print(f"{label:44s} {per*1e3:9.2f} ms/call  {R/per/1e6:8.2f} Mrays/s", flush=True)

def make_cull(sub, ro, rd):
    def mk(K):
        @jax.jit
        def f(ro, rd):
            def body(i, c):
                o, acc = c
                t, s = TC.bvh_hit_ts_cull(bvh, o, rd, 1e-4, sub=sub)
                o = o + 1e-12 * jnp.where(jnp.isfinite(t), t, 0.0)[:, None]
                return o, acc + jnp.where(jnp.isfinite(t), t, 0.0).sum()
            _, acc = jax.lax.fori_loop(0, K, body, (ro, 0.0))
            return acc
        return functools.partial(f, ro, rd)
    return mk

for sub in (1, 2, 4, 8):
    amort(f"cull sub={sub} camera", make_cull(sub, ro, rd))
for sub in (1, 2, 4, 8):
    amort(f"cull sub={sub} bounce", make_cull(sub, ro2, rd2))
