"""Leaf-list-size diagnostics: per-block union size vs block granularity
and Morton sort resolution, on realistic scattered bounce rays.

Informs the per-row-list sweep kernel design (traverse_cull.py): Pallas
tiles are (8,128), so per-128-ray lists require per-sublane-row leaf
indexing; this measures how much sweep work that saves.
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.models.scenes import bunny
from offline_raytracer_tpu.ops import traverse as T
from offline_raytracer_tpu.ops import traverse_cull as tc
from offline_raytracer_tpu.ops.camera import generate_rays
from offline_raytracer_tpu.utils import rng

R = 1 << 16


def order_keys(bvh, ro, rd, bits, octant_major=True):
    row = bvh.child_rows[0]
    wmin = jnp.minimum(row[0:3], row[6:9])
    wmax = jnp.maximum(row[3:6], row[9:12])
    ext = jnp.maximum(wmax - wmin, 1e-6)
    n = 1 << bits
    q = jnp.clip((ro - wmin) / ext * n, 0.0, n - 1).astype(jnp.int32)

    def spread(x, nb):
        out = jnp.zeros_like(x)
        for i in range(nb):
            out = out | (((x >> i) & 1) << (3 * i))
        return out

    m = (spread(q[:, 0], bits) << 2) | (spread(q[:, 1], bits) << 1) | spread(q[:, 2], bits)
    octant = (((rd[:, 0] > 0).astype(jnp.int32) << 2)
              | ((rd[:, 1] > 0).astype(jnp.int32) << 1)
              | (rd[:, 2] > 0).astype(jnp.int32))
    if octant_major:
        return jnp.argsort((octant << (3 * bits)) | m)
    return jnp.argsort((m << 3) | octant)


def report(tag, bvh, ro, rd, blocks=(128, 256, 1024)):
    tfar = jnp.full((ro.shape[0],), 3.4e38)
    for blk in blocks:
        lists, counts = jax.jit(
            lambda o, d, t: tc.block_leaf_lists(bvh, o, d, t, blk))(ro, rd, tfar)
        c = np.asarray(counts).ravel()
        # max-of-8 model: rows grouped 8 per super-block iterate max(count)
        if blk == 128:
            m8 = c.reshape(-1, 8).max(1)
            extra = f" max-of-8 total={m8.sum()*1024/1e6:7.2f}"
        else:
            extra = ""
        print(f"{tag:34s} blk={blk:5d}: mean={c.mean():6.1f} p95={np.percentile(c,95):5.0f} "
              f"work={c.sum()*blk/1e6:7.2f} Mray-leaf{extra}", flush=True)


def main():
    W = H = 512
    scene = bunny(width=W, height=H)
    cfg = RenderConfig(width=W, height=H, spp=32, max_bounces=8,
                       enable_dof=False, ray_batch=R)
    bvh = scene.tri_bvh

    ids = jnp.arange(R, dtype=jnp.int32) % (W * H)
    root = rng.render_key(0)
    keys = rng.pixel_sample_keys(root, ids, jnp.zeros((R,), jnp.int32))
    ro, rd = jax.jit(lambda i, k: generate_rays(scene.camera, cfg, i, k))(ids, keys)

    trace_fn = T.make_bvh_trace_fn(scene, cfg)

    @jax.jit
    def scatter_rays(ro, rd, keys):
        o, d = ro, rd
        for b in range(2):
            hit = trace_fn(o, d)
            t = jnp.where(hit.valid, hit.t, 1.0)
            x = o + (t - 1e-4)[:, None] * d
            u = rng.bounce_uniforms(keys, b + 7, 2)
            z = jnp.sqrt(jnp.clip(1 - u[:, 0], 1e-6, 1.0))
            s = jnp.sqrt(jnp.clip(u[:, 0], 0.0, 1.0))
            phi = 2 * jnp.pi * u[:, 1]
            n = hit.normal
            a = jnp.where(jnp.abs(n[:, 2:3]) < 0.9,
                          jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
            tx = jnp.cross(n, a); tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
            ty = jnp.cross(n, tx)
            wi = (s * jnp.cos(phi))[:, None] * tx + (s * jnp.sin(phi))[:, None] * ty + z[:, None] * n
            o = jnp.where(hit.valid[:, None], x, o)
            d = jnp.where(hit.valid[:, None], wi, d)
        return o, d

    so, sd = scatter_rays(ro, rd, keys)
    so = jnp.asarray(np.asarray(so)); sd = jnp.asarray(np.asarray(sd))

    # camera rays, current sort
    o0 = jax.jit(lambda o, d: T.coherence_order(bvh, o, d))(ro, rd)
    report("camera, oct-major morton3", bvh, ro[o0], rd[o0])

    o1 = jax.jit(lambda o, d: T.coherence_order(bvh, o, d))(so, sd)
    report("scattered, oct-major morton3", bvh, so[o1], sd[o1])

    for bits, om in ((5, True), (7, True), (5, False), (7, False)):
        o2 = jax.jit(lambda o, d: order_keys(bvh, o, d, bits, om))(so, sd)
        report(f"scattered, {'oct' if om else 'pos'}-major morton{bits}",
               bvh, so[o2], sd[o2])


if __name__ == "__main__":
    main()
