"""Marginal-cost timing of the per-row-list cull sweep on real rays."""

from __future__ import annotations

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
from offline_raytracer_tpu.ops import traverse as T
from offline_raytracer_tpu.ops import traverse_cull as tc
from offline_raytracer_tpu.ops.camera import generate_rays
from offline_raytracer_tpu.utils import rng

K1, K2 = 2, 10
R = 1 << 16


def marginal(name, step_fn, init, n=3):
    def make(K):
        @jax.jit
        def run(c):
            def body(c, _):
                return step_fn(c), None
            c, _ = jax.lax.scan(body, c, None, length=K)
            return jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l.astype(jnp.float32)) * 1e-30,
                c, jnp.float32(0))
        return run
    r1, r2 = make(K1), make(K2)
    np.asarray(r1(init)); np.asarray(r2(init))
    def bestt(r):
        ts = []
        for _ in range(n):
            t0 = time.time(); np.asarray(r(init)); ts.append(time.time() - t0)
        return min(ts)
    b1, b2 = bestt(r1), bestt(r2)
    ms = (b2 - b1) / (K2 - K1) * 1e3
    print(f"{name:48s} {ms:8.3f} ms/iter", flush=True)
    return ms


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

    # pre-sort both sets with the production sort
    oc = jax.jit(lambda o, d: T.coherence_order(bvh, o, d))
    o0 = oc(ro, rd); ro_s, rd_s = ro[o0], rd[o0]
    o1 = oc(so, sd); so_s, sd_s = so[o1], sd[o1]

    def perturb(o, t):
        return o + (t[:, None] % jnp.float32(1e-6)) * 1e-6

    for name, (o_, d_) in (("camera", (ro_s, rd_s)), ("scattered", (so_s, sd_s))):
        def step_c(c, d_=d_):
            o, acc = c
            t, slot = tc.bvh_hit_ts_cull(bvh, o, d_, cfg.t_min)
            t = jnp.where(jnp.isfinite(t), t, 0.0)
            return perturb(o, t), acc + jnp.sum(t) * 1e-20
        marginal(f"{name}: closest-hit cull (per-row lists)", step_c,
                 (o_, jnp.float32(0)))
        def step_a(c, d_=d_):
            o, acc = c
            t, slot = tc.bvh_hit_ts_cull(bvh, o, d_, cfg.t_min,
                                         t_far=jnp.full((R,), 10.0), any_hit=True)
            return perturb(o, slot.astype(jnp.float32)), acc + jnp.sum(slot) * 1e-20
        marginal(f"{name}: any-hit cull (per-row lists)", step_a,
                 (o_, jnp.float32(0)))

    # full trace fn + full bounce slope
    def s_trace(c):
        o, acc = c
        hit = trace_fn(o, sd_s)
        t = jnp.where(hit.valid, hit.t, 0.0)
        return perturb(o, t), acc + jnp.sum(t) * 1e-20
    marginal("scattered: full trace_fn (sort+cull+refine)", s_trace,
             (so_s, jnp.float32(0)))

    from offline_raytracer_tpu.integrator import trace_paths
    for nb1, nb2 in [(2, 10)]:
        def run_nb(nb):
            c = cfg.replace(max_bounces=nb, russian_roulette=1.0)
            tf = T.make_bvh_trace_fn(scene, c)
            of = T.make_bvh_occlusion_fn(scene, c)
            @jax.jit
            def go(o, d, k):
                r = trace_paths(scene, c, tf, o, d, k, occl_fn=of)
                return jnp.sum(r) * 1e-30
            return go
        g1, g2 = run_nb(nb1), run_nb(nb2)
        np.asarray(g1(ro, rd, keys)); np.asarray(g2(ro, rd, keys))
        def best(g):
            ts = []
            for _ in range(3):
                t0 = time.time(); np.asarray(g(ro, rd, keys)); ts.append(time.time() - t0)
            return min(ts)
        b1, b2 = best(g1), best(g2)
        ms = (b2 - b1) / (nb2 - nb1) * 1e3
        print(f"{'full bounce slope (no RR)':48s} {ms:8.3f} ms/bounce "
              f"(nb{nb1}={b1*1e3:7.1f}ms nb{nb2}={b2*1e3:7.1f}ms)", flush=True)


if __name__ == "__main__":
    main()
