"""Decompose the fwd+bwd step (bench grad config) by ablation on chip.

Variants, all timed with the bench's enqueue-4-then-sync method:
  fwd            — forward render_block only (mega, no records)
  fwd+records    — megakernel forward WITH record collection
  replay_fwd     — records + full XLA replay forward (no VJP)
  grad both      — the bench step: d/d(diffuse, v0)
  grad diffuse   — d/d(diffuse) only
  grad v0        — d/d(v0) only

Run: python benchmarks/profile_grad.py
"""
import os
import sys
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
from offline_raytracer_tpu import replay as replay_mod
from offline_raytracer_tpu.ops import mega

W = H = 512


def timeit(name, fn, reps=4):
    t0 = time.time()
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / reps
    print(f"{name:14s} {dt*1e3:8.2f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return dt


def main():
    scene = bunny(width=W, height=H)
    cfg = RenderConfig(width=W, height=H, spp=32, max_bounces=8,
                       enable_dof=False, ray_batch=W * H)
    order = tile_pixel_ids(W, H)
    gcfg = cfg.replace(traversal="auto", max_bounces=8)
    gids = jnp.asarray(order[: 1 << 16])

    def loss_fn(diffuse, v0):
        sc = scene.replace(
            materials=scene.materials.replace(diffuse=diffuse),
            triangles=scene.triangles.replace(v0=v0))
        return jnp.mean(render_block(sc, gcfg, gids, 0, 1))

    args = (scene.materials.diffuse, scene.triangles.v0)

    fwd = jax.jit(lambda: jnp.mean(render_block(scene, gcfg, gids, 0, 1)))
    timeit("fwd", fwd)

    g_both = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    timeit("grad both", lambda: g_both(*args))
    g_d = jax.jit(jax.value_and_grad(loss_fn, argnums=(0,)))
    timeit("grad diffuse", lambda: g_d(*args))
    g_v = jax.jit(jax.value_and_grad(loss_fn, argnums=(1,)))
    timeit("grad v0", lambda: g_v(*args))

    # ---- isolate the pieces of the backward ----------------------------
    from offline_raytracer_tpu.integrator import trace_paths
    from offline_raytracer_tpu.ops.camera import generate_rays
    from offline_raytracer_tpu.utils import rng as rng_mod

    root = rng_mod.render_key(gcfg.seed)
    keys = rng_mod.pixel_sample_keys(
        root, gids, jnp.zeros((gids.shape[0],), jnp.int32))
    ro, rd = generate_rays(scene.camera, gcfg, gids, keys)

    f_rec = jax.jit(lambda: mega.render_paths_mega(
        scene, gcfg, ro, rd, keys, collect_records=True))
    timeit("fwd+records", f_rec)
    _, ids_rec, vis_rec = f_rec()
    ids_rec = jax.block_until_ready(ids_rec)

    rp_fwd = jax.jit(lambda: jnp.mean(trace_paths(
        scene, gcfg, None, ro, rd, keys, replay=(ids_rec, vis_rec))))
    timeit("replay fwd", rp_fwd)

    def rp_loss(diffuse, v0):
        sc = scene.replace(
            materials=scene.materials.replace(diffuse=diffuse),
            triangles=scene.triangles.replace(v0=v0))
        return jnp.mean(trace_paths(
            sc, gcfg, None, ro, rd, keys, replay=(ids_rec, vis_rec)))

    rp_g = jax.jit(jax.value_and_grad(rp_loss, argnums=(0, 1)))
    timeit("replay vjp", lambda: rp_g(*args))

    # vjp w.r.t. the FULL (scene, ro, rd) pytree — what _mega_paths_bwd
    # computes unconditionally; sums every cotangent leaf so none DCEs
    def rp_all():
        def f(sc, ro_, rd_):
            return jnp.mean(trace_paths(
                sc, gcfg, None, ro_, rd_, keys, replay=(ids_rec, vis_rec)))
        _, vjp = jax.vjp(f, scene, ro, rd)
        cts = vjp(jnp.ones(()))
        return sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(cts)
                   if jnp.issubdtype(l.dtype, jnp.floating))
    timeit("replay vjp ALL", jax.jit(rp_all))

    # the custom_vjp route with fixed rays: is the 80-vs-60 ms gap DCE
    # blocked inside _mega_paths_bwd, or render_block glue?
    def cv_loss(diffuse, v0):
        sc = scene.replace(
            materials=scene.materials.replace(diffuse=diffuse),
            triangles=scene.triangles.replace(v0=v0))
        return jnp.mean(replay_mod.mega_paths_diff(
            sc, gcfg, ro, rd, keys))
    cv_g = jax.jit(jax.value_and_grad(cv_loss, argnums=(0, 1)))
    timeit("customvjp step", lambda: cv_g(*args))

    # the full bench step on the replay-value route (grad_mode knob)
    rcfg = gcfg.replace(grad_mode="replay-value")

    def rv_loss(diffuse, v0):
        sc = scene.replace(
            materials=scene.materials.replace(diffuse=diffuse),
            triangles=scene.triangles.replace(v0=v0))
        return jnp.mean(render_block(sc, rcfg, gids, 0, 1))
    rv_g = jax.jit(jax.value_and_grad(rv_loss, argnums=(0, 1)))
    timeit("replayval step", lambda: rv_g(*args))


if __name__ == "__main__":
    main()
