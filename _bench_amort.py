"""Amortized timing: K chained calls inside one jit, one readback.

cost_per_call = (t(K2) - t(K1)) / (K2 - K1) — immune to the ~25ms
axon round-trip floor.
"""
import os, time, functools, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
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

def timed(fn, *args, n=3):
    np.asarray(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = np.asarray(fn(*args))
    return (time.time() - t0) / n

def amort(label, make_fn, k1=1, k2=5, rays=R):
    f1 = make_fn(k1); f2 = make_fn(k2)
    t1 = timed(f1); t2 = timed(f2)
    per = (t2 - t1) / (k2 - k1)
    print(f"{label:44s} {per*1e3:9.2f} ms/call  {rays/per/1e6:8.2f} Mrays/s")

def make_packet(K):
    @jax.jit
    def f(ro, rd):
        def body(i, c):
            o, d, acc = c
            t, s = TP.bvh_hit_ts_pallas(bvh, o, d, 1e-4)
            # data-dependence: perturb origin by result so calls chain
            o = o + 1e-12 * jnp.where(jnp.isfinite(t), t, 0.0)[:, None]
            return o, d, acc + jnp.where(jnp.isfinite(t), t, 0.0).sum()
        _, _, acc = jax.lax.fori_loop(0, K, body, (ro, rd, 0.0))
        return acc
    return functools.partial(f, ro, rd)

def make_cull(K):
    @jax.jit
    def f(ro, rd):
        def body(i, c):
            o, d, acc = c
            t, s = TC.bvh_hit_ts_cull(bvh, o, d, 1e-4)
            o = o + 1e-12 * jnp.where(jnp.isfinite(t), t, 0.0)[:, None]
            return o, d, acc + jnp.where(jnp.isfinite(t), t, 0.0).sum()
        _, _, acc = jax.lax.fori_loop(0, K, body, (ro, rd, 0.0))
        return acc
    return functools.partial(f, ro, rd)

def make_lists(K):
    tb = jnp.full((R,), TC.INF)
    @jax.jit
    def f(ro, rd):
        def body(i, c):
            o, acc = c
            lists, counts = TC.block_leaf_lists(bvh, o, rd, tb, 1024)
            o = o + 1e-12 * counts.sum() * jnp.ones((1, 3))
            return o, acc + counts.sum()
        _, acc = jax.lax.fori_loop(0, K, body, (ro, 0.0))
        return acc
    return functools.partial(f, ro, rd)

def make_sweep(K):
    tb = jnp.full((R,), TC.INF)
    lists, counts = TC.block_leaf_lists(bvh, ro, rd, tb, 1024)
    planes7 = tuple(p.reshape(64 * 8, 128)
                    for p in (ro[:, 0], ro[:, 1], ro[:, 2],
                              rd[:, 0], rd[:, 1], rd[:, 2], tb))
    @jax.jit
    def f(planes7, lists, counts):
        def body(i, c):
            p7, acc = c
            t, s = TC._sweep_pallas(p7, lists, counts, bvh.planes,
                                    m_occ=bvh.m_occ, t_min=1e-4, sub=8)
            p7 = (p7[0] + 1e-12 * jnp.where(s >= 0, t, 0.0),) + p7[1:]
            return p7, acc + jnp.where(s >= 0, t, 0.0).sum()
        _, acc = jax.lax.fori_loop(0, K, body, (planes7, 0.0))
        return acc
    return functools.partial(f, planes7, lists, counts)

def make_noop_pallas(K):
    rays7 = tuple(jnp.ones((512, 128), jnp.float32) for _ in range(7))
    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    def knop(*refs):
        refs[-1][:] = refs[0][:] + 1.0
    @jax.jit
    def f(rays7):
        def body(i, c):
            r, acc = c
            out = pl.pallas_call(knop, grid=(64,),
                in_specs=[ray_spec] * 7, out_specs=ray_spec,
                out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32))(*r)
            return (out,) + r[1:], acc + out.sum()
        _, acc = jax.lax.fori_loop(0, K, body, (rays7, 0.0))
        return acc
    return functools.partial(f, rays7)

amort("noop pallas grid=64", make_noop_pallas)
amort("packet traversal (coherent)", make_packet)
amort("cull traversal full (coherent)", make_cull)
amort("  cull+lists only", make_lists)
amort("  sweep only", make_sweep)
