"""Per-component timing on the real chip: where does the bounce go?

Times, on a bunny-scene ray batch of the bench size (65536 rays):
argsort, cull traversal (sorted/unsorted), any-hit, light sampling,
BSDF sample/eval, RNG key derivation. Run: python benchmarks/profile_components.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.models.scenes import bunny
from offline_raytracer_tpu.ops import bsdf as bsdf_ops
from offline_raytracer_tpu.ops import lights as light_ops
from offline_raytracer_tpu.ops import traverse as T
from offline_raytracer_tpu.ops.camera import generate_rays
from offline_raytracer_tpu.utils import rng

R = 1 << 16


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:40s} {dt*1e3:8.2f} ms   ({R/dt/1e6:7.1f} Mrays/s)")
    return out


def main():
    scene = bunny(width=256, height=256)
    cfg = RenderConfig(width=256, height=256, spp=1, max_bounces=8,
                       enable_dof=False, ray_batch=R)
    root = rng.render_key(0)
    pixel_ids = jnp.arange(R, dtype=jnp.int32) % (256 * 256)
    ps_keys = rng.pixel_sample_keys(root, pixel_ids, jnp.zeros((R,), jnp.int32))
    ro, rd = generate_rays(scene.camera, cfg, pixel_ids, ps_keys)
    ro, rd = jax.block_until_ready((ro, rd))
    bvh = scene.tri_bvh

    mats = scene.materials

    timeit("argsort(coherence_order)", jax.jit(
        lambda ro, rd: T.coherence_order(bvh, ro, rd)), ro, rd)

    order = T.coherence_order(bvh, ro, rd)
    timeit("argsort(inverse perm)", jax.jit(jnp.argsort), order)

    from offline_raytracer_tpu.ops import traverse_cull as tc
    hit_sorted = jax.jit(lambda ro, rd: T._sorted_tri_hit(
        bvh, tc.bvh_hit_ts_cull, cfg, ro, rd))
    timeit("cull closest-hit (sorted)", hit_sorted, ro, rd)

    hit_unsorted = jax.jit(lambda ro, rd: tc.bvh_hit_ts_cull(
        bvh, ro, rd, cfg.t_min))
    timeit("cull closest-hit (UNsorted)", hit_unsorted, ro, rd)

    tfar = jnp.full((R,), 5.0)
    timeit("cull any-hit (UNsorted)", jax.jit(
        lambda ro, rd, tf: tc.bvh_hit_ts_cull(
            bvh, ro, rd, cfg.t_min, tf, any_hit=True)), ro, rd, tfar)

    timeit("bounce_uniforms x8", jax.jit(
        lambda k: rng.bounce_uniforms(k, 3, 8)), ps_keys)

    u8 = rng.bounce_uniforms(ps_keys, 0, 8)
    timeit("sample_lights (batched)", jax.jit(
        lambda u: light_ops.sample_lights(u, scene.lights, mats.emit)),
        u8[:, 0:4])

    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (R, 1))
    wo = -rd
    matp = bsdf_ops.gather_mat_params(mats, jnp.zeros((R,), jnp.int32),
                                      cfg.default_roughness,
                                      cfg.roughness_from_material)

    timeit("sample_bsdf (batched)", jax.jit(
        lambda u, n, wo: bsdf_ops.sample_bsdf(u, n, wo, matp)),
        u8[:, 5:8], n, wo)

    wi = rd
    timeit("eval+pdf bsdf (batched)", jax.jit(
        lambda n, wi, wo, seg: (
            bsdf_ops.eval_bsdf(n, wi, wo, matp, seg),
            bsdf_ops.pdf_bsdf(n, wi, wo, matp))), n, wi, wo, tfar)


if __name__ == "__main__":
    main()
