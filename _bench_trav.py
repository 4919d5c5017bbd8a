"""Head-to-head: packet tree walk vs cull-and-sweep on bunny rays (TPU).

The axon tunnel's dispatch latency is wildly variable (0.1-50 ms), so each
variant runs K=8 dependent repetitions inside ONE jit and syncs once;
per-call time = total / K. Camera rays and incoherent bounce-like rays.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from offline_raytracer_tpu.models.scenes import bunny
from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.ops.camera import generate_rays
from offline_raytracer_tpu.ops.traverse import bvh_hit_ts, coherence_order
from offline_raytracer_tpu.ops.traverse_pallas import bvh_hit_ts_pallas
from offline_raytracer_tpu.ops.traverse_cull import bvh_hit_ts_cull
from offline_raytracer_tpu.utils import rng

R = 1 << 16
K = 8
W = H = 256
scene = bunny(W, H)
bvh = scene.tri_bvh
cfg = RenderConfig(width=W, height=H, enable_dof=False)
root = rng.render_key(0)
ids = jnp.arange(R, dtype=jnp.int32) % (W * H)
keys = rng.pixel_sample_keys(root, ids, jnp.zeros((R,), jnp.int32))
ro, rd = generate_rays(scene.camera, cfg, ids, keys)

rs = np.random.RandomState(0)
ro2 = jnp.asarray(rs.uniform(-1, 1, (R, 3)).astype(np.float32)
                  * np.array([1.5, 1.0, 1.5], np.float32))
rd2 = jnp.asarray(rs.randn(R, 3).astype(np.float32))
rd2 = rd2 / jnp.linalg.norm(rd2, axis=-1, keepdims=True)


def repeat_k(hit_fn):
    """K dependent traversals in one jit: origin nudged by last t."""
    @jax.jit
    def run(ro, rd):
        def body(c, _):
            o, acc = c
            t, s = hit_fn(o, rd)
            tt = jnp.where(jnp.isfinite(t), t, 0.0)
            # tiny dependent perturbation; keeps rays essentially identical
            o = o + (tt * 1e-12)[:, None] * rd
            return (o, acc + tt), None
        (_, acc), _ = jax.lax.scan(body, (ro, jnp.zeros(ro.shape[0])), None, length=K)
        return acc
    return run


def sortwrap(hit_fn):
    def f(ro, rd):
        o = coherence_order(bvh, ro, rd)
        inv = jnp.argsort(o)
        t, s = hit_fn(ro[o], rd[o])
        return t[inv], s[inv]
    return f


def bench(label, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n / K
    print(f"{label:40s} {dt*1e3:8.3f} ms   {R/dt/1e6:8.2f} Mrays/s", flush=True)


variants = {
    "packet": lambda o, d: bvh_hit_ts_pallas(bvh, o, d, 1e-6),
    "packet+sort": sortwrap(lambda o, d: bvh_hit_ts_pallas(bvh, o, d, 1e-6)),
    "cull": lambda o, d: bvh_hit_ts_cull(bvh, o, d, 1e-6),
    "cull+sort": sortwrap(lambda o, d: bvh_hit_ts_cull(bvh, o, d, 1e-6)),
}

print(f"bvh: m_occ={bvh.m_occ} leaves, {bvh.child_rows.shape[0]} nodes; "
      f"R={R}, K={K} in-jit repeats")
for tag, (o, d) in (("camera", (ro, rd)), ("incoherent", (ro2, rd2))):
    for label, fn in variants.items():
        bench(f"{tag:11s} {label}", repeat_k(fn), o, d)
