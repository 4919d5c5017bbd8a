"""Phase-level profiling of the bunny bench on the real chip.

The axon dispatch path has ~25ms round-trip latency and
``block_until_ready`` does not reliably synchronize, so single-launch
timing is garbage. Methodology here: chain K data-dependent iterations
of each phase inside ONE jit (lax.scan with a carry that feeds the next
iteration), reduce to a scalar, force a host transfer, and report the
slope between two K values — the marginal per-iteration cost with
dispatch latency cancelled out.

Run:  PYTHONPATH="$PYTHONPATH:/root/repo" python benchmarks/profile_phases.py
"""

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


def _scalar(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    s = jnp.float32(0)
    for l in leaves:
        s = s + jnp.sum(l.astype(jnp.float32)) * 1e-30
    return s


def marginal(name, step_fn, init, n=3):
    """step_fn: carry -> carry (data-dependent). Reports ms/iteration."""
    def make(K):
        @jax.jit
        def run(c):
            def body(c, _):
                return step_fn(c), None
            c, _ = jax.lax.scan(body, c, None, length=K)
            return _scalar(c)
        return run

    r1, r2 = make(K1), make(K2)
    t0 = time.time()
    np.asarray(r1(init))
    tcomp = time.time() - t0
    np.asarray(r2(init))

    def best(r):
        ts = []
        for _ in range(n):
            t0 = time.time()
            np.asarray(r(init))
            ts.append(time.time() - t0)
        return min(ts)

    b1, b2 = best(r1), best(r2)
    ms = (b2 - b1) / (K2 - K1) * 1e3
    print(f"{name:44s} {ms:9.3f} ms/iter   (K{K1}={b1*1e3:8.1f}ms "
          f"K{K2}={b2*1e3:8.1f}ms compile {tcomp:6.1f}s)", flush=True)
    return ms


def main():
    W = H = 512
    R = 1 << 16
    scene = bunny(width=W, height=H)
    cfg = RenderConfig(width=W, height=H, spp=32, max_bounces=8,
                       enable_dof=False, ray_batch=R)
    bvh = scene.tri_bvh
    print(f"bvh: n_leaves={bvh.n_leaves} m_occ={bvh.m_occ} "
          f"planes={bvh.planes.shape} child_rows={bvh.child_rows.shape}")
    print(f"cull_ok={tc.cull_ok(bvh)} fits={tc.fits_vmem(bvh)}", flush=True)

    ids = jnp.arange(R, dtype=jnp.int32) % (W * H)
    root = rng.render_key(0)
    keys = rng.pixel_sample_keys(root, ids, jnp.zeros((R,), jnp.int32))
    ro, rd = jax.jit(lambda i, k: generate_rays(scene.camera, cfg, i, k))(ids, keys)
    ro = np.asarray(ro); rd = np.asarray(rd)
    ro, rd = jnp.asarray(ro), jnp.asarray(rd)
    tfar = jnp.full((R,), 3.4e38)

    def perturb(o, t):
        # tiny data-dependent shift so scan iterations can't be CSE'd
        return o + (t[:, None] % jnp.float32(1e-6)) * 1e-6

    # --- cull sub-phases
    def s_cull_lists(c):
        o, acc = c
        lists, counts = tc.block_leaf_lists(bvh, o, rd, tfar, 1024)
        return perturb(o, counts.astype(jnp.float32).ravel()[:1].repeat(R)), acc + _scalar(lists)
    marginal("cull: block_leaf_lists", s_cull_lists, (ro, jnp.float32(0)))

    def s_cull_full(c):
        o, acc = c
        t, slot = tc.bvh_hit_ts_cull(bvh, o, rd, cfg.t_min)
        t = jnp.where(jnp.isfinite(t), t, 0.0)
        return perturb(o, t), acc + jnp.sum(t) * 1e-20
    marginal("cull: closest-hit (full)", s_cull_full, (ro, jnp.float32(0)))

    def s_cull_any(c):
        o, acc = c
        t, slot = tc.bvh_hit_ts_cull(bvh, o, rd, cfg.t_min,
                                     t_far=jnp.full((R,), 10.0), any_hit=True)
        return perturb(o, slot.astype(jnp.float32)), acc + jnp.sum(slot) * 1e-20
    marginal("cull: any-hit (full)", s_cull_any, (ro, jnp.float32(0)))

    def s_sort(c):
        o, acc = c
        order = T.coherence_order(bvh, o, rd)
        inv = jnp.argsort(order)
        return perturb(o, inv.astype(jnp.float32)), acc + jnp.sum(order) * 1e-20
    marginal("coherence_order + inverse (2 argsorts)", s_sort, (ro, jnp.float32(0)))

    # --- full trace fns as configured
    trace_fn = T.make_bvh_trace_fn(scene, cfg)
    def s_trace(c):
        o, acc = c
        hit = trace_fn(o, rd)
        t = jnp.where(hit.valid, hit.t, 0.0)
        return perturb(o, t), acc + jnp.sum(t) * 1e-20
    marginal("closest-hit trace (sort_rays on)", s_trace, (ro, jnp.float32(0)))

    cfg_ns = cfg.replace(sort_rays=False)
    trace_ns = T.make_bvh_trace_fn(scene, cfg_ns)
    def s_trace_ns(c):
        o, acc = c
        hit = trace_ns(o, rd)
        t = jnp.where(hit.valid, hit.t, 0.0)
        return perturb(o, t), acc + jnp.sum(t) * 1e-20
    marginal("closest-hit trace (sort_rays OFF)", s_trace_ns, (ro, jnp.float32(0)))

    occl_fn = T.make_bvh_occlusion_fn(scene, cfg)
    def s_occl(c):
        o, acc = c
        occ = occl_fn(o, rd, jnp.full((R,), 10.0))
        return perturb(o, occ.astype(jnp.float32)), acc + jnp.sum(occ) * 1e-20
    marginal("occlusion (sort_rays on)", s_occl, (ro, jnp.float32(0)))

    occl_ns = T.make_bvh_occlusion_fn(scene, cfg_ns)
    def s_occl_ns(c):
        o, acc = c
        occ = occl_ns(o, rd, jnp.full((R,), 10.0))
        return perturb(o, occ.astype(jnp.float32)), acc + jnp.sum(occ) * 1e-20
    marginal("occlusion (sort_rays OFF)", s_occl_ns, (ro, jnp.float32(0)))

    # --- shading-only bounce (no traversal): lights + bsdf + rng
    from offline_raytracer_tpu.ops import bsdf as bsdf_ops
    from offline_raytracer_tpu.ops import lights as light_ops
    mats = scene.materials

    def s_shade(c):
        o, acc = c
        u8 = rng.bounce_uniforms(keys, 0, 8)
        n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (R, 1))
        wo = -rd
        matp = bsdf_ops.gather_mat_params(mats, jnp.zeros((R,), jnp.int32),
                                          cfg.default_roughness, True)
        ls = light_ops.sample_lights(u8[:, 0:4], scene.lights, mats.emit)
        to_l = ls.p - o
        dist_l = jnp.linalg.norm(to_l, axis=-1)
        wi_l = to_l / jnp.maximum(dist_l, 1e-9)[..., None]
        f_l = bsdf_ops.eval_bsdf(n, wi_l, wo, matp, dist_l)
        samp = bsdf_ops.sample_bsdf(u8[:, 5:8], n, wo, matp)
        pdf = bsdf_ops.pdf_bsdf(n, samp.wi, wo, matp)
        f = bsdf_ops.eval_bsdf(n, samp.wi, wo, matp, dist_l)
        val = jnp.sum(f_l + f, -1) + pdf
        return perturb(o, val), acc + jnp.sum(val) * 1e-20
    marginal("shading only (rng+lights+bsdf, no trace)", s_shade, (ro, jnp.float32(0)))

    # --- full bounce via trace_paths marginal over bounces: compare 2 vs 10 bounces
    from offline_raytracer_tpu.integrator import trace_paths
    for nb1, nb2 in [(2, 10)]:
        def run_nb(nb):
            c = cfg.replace(max_bounces=nb, russian_roulette=1.0)
            tf = T.make_bvh_trace_fn(scene, c)
            of = T.make_bvh_occlusion_fn(scene, c)
            @jax.jit
            def go(o, d, k):
                return _scalar(trace_paths(scene, c, tf, o, d, k, occl_fn=of))
            return go
        g1, g2 = run_nb(nb1), run_nb(nb2)
        t0 = time.time(); np.asarray(g1(ro, rd, keys)); tc1 = time.time() - t0
        t0 = time.time(); np.asarray(g2(ro, rd, keys)); tc2 = time.time() - t0
        def best(g):
            ts = []
            for _ in range(3):
                t0 = time.time(); np.asarray(g(ro, rd, keys)); ts.append(time.time() - t0)
            return min(ts)
        b1, b2 = best(g1), best(g2)
        ms = (b2 - b1) / (nb2 - nb1) * 1e3
        print(f"{'full bounce (trace_paths slope, no RR)':44s} {ms:9.3f} ms/bounce  "
              f"(nb{nb1}={b1*1e3:8.1f}ms nb{nb2}={b2*1e3:8.1f}ms "
              f"compile {tc1:.0f}s/{tc2:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
