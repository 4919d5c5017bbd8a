"""Honest re-timing of the fwd+bwd decomposition: every variant is
wrapped so a single scalar output depends on ALL outputs (sum of every
leaf), and the clock stops on that scalar's host transfer — the axon
dispatch path does not sync on block_until_ready, and a transfer of the
loss alone can return before the gradient buffers finish.

Run: python benchmarks/profile_grad2.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.models.scenes import bunny
from offline_raytracer_tpu.render import render_block, tile_pixel_ids
from offline_raytracer_tpu.integrator import trace_paths
from offline_raytracer_tpu.ops import mega
from offline_raytracer_tpu.ops.camera import generate_rays
from offline_raytracer_tpu.utils import rng as rng_mod

W = H = 512


def tree_scalar(x):
    return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(x)
               if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating))


def timeit(name, fn, reps=4):
    g = jax.jit(lambda: tree_scalar(fn()))
    t0 = time.time()
    np.asarray(g())
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = g()
    np.asarray(out)
    dt = (time.time() - t0) / reps
    print(f"{name:16s} {dt*1e3:8.2f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return dt


def main():
    scene = bunny(width=W, height=H)
    cfg = RenderConfig(width=W, height=H, spp=32, max_bounces=8,
                       enable_dof=False, ray_batch=W * H)
    order = tile_pixel_ids(W, H)
    gcfg = cfg.replace(traversal="auto", max_bounces=8)
    gids = jnp.asarray(order[: 1 << 16])
    args = (scene.materials.diffuse, scene.triangles.v0)

    root = rng_mod.render_key(gcfg.seed)
    keys = rng_mod.pixel_sample_keys(
        root, gids, jnp.zeros((gids.shape[0],), jnp.int32))
    ro, rd = generate_rays(scene.camera, gcfg, gids, keys)

    def loss_with(cfg_):
        def loss_fn(diffuse, v0):
            sc = scene.replace(
                materials=scene.materials.replace(diffuse=diffuse),
                triangles=scene.triangles.replace(v0=v0))
            return jnp.mean(render_block(sc, cfg_, gids, 0, 1))
        return loss_fn

    timeit("fwd", lambda: render_block(scene, gcfg, gids, 0, 1))
    f_rec = lambda: mega.render_paths_mega(
        scene, gcfg, ro, rd, keys, collect_records=True)
    timeit("fwd+records", f_rec)
    _, ids_rec, vis_rec = jax.jit(f_rec)()
    ids_rec = jax.block_until_ready(ids_rec)
    vis_rec = jax.block_until_ready(vis_rec)

    def rp_loss(diffuse, v0):
        sc = scene.replace(
            materials=scene.materials.replace(diffuse=diffuse),
            triangles=scene.triangles.replace(v0=v0))
        return jnp.mean(trace_paths(
            sc, gcfg, None, ro, rd, keys, replay=(ids_rec, vis_rec)))
    timeit("replay vjp", lambda: jax.value_and_grad(
        rp_loss, argnums=(0, 1))(*args))

    timeit("step kernel-val", lambda: jax.value_and_grad(
        loss_with(gcfg), argnums=(0, 1))(*args))
    timeit("step replay-val", lambda: jax.value_and_grad(
        loss_with(gcfg.replace(grad_mode="replay-value")),
        argnums=(0, 1))(*args))


if __name__ == "__main__":
    main()
