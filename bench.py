"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric: Mrays/s on the bunny scene (BASELINE.json configs[2]: bunny.ply,
512x512, area light + NEE). "Rays" counts every traced ray — path
extension segments plus NEE shadow rays — from the integrator's own
alive-mask statistics (render_block_stats), not assumed from spp. The
reference publishes no numbers (BASELINE.md), so vs_baseline compares
against the first value this harness ever recorded on this hardware
(bench_baseline.json, committed).
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from offline_raytracer_tpu.config import RenderConfig
    from offline_raytracer_tpu.models.scenes import bunny
    from offline_raytracer_tpu.render import render_block_stats_jit

    W = H = 512
    SPP = 32
    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:
        # CPU smoke fallback so the harness runs anywhere
        W = H = 64
        SPP = 4
    t0 = time.time()
    scene = bunny(width=W, height=H)
    print(f"scene+BVH built in {time.time()-t0:.1f}s", file=sys.stderr)

    cfg = RenderConfig(width=W, height=H, spp=SPP, max_bounces=8,
                       enable_dof=False, ray_batch=1 << 16)

    n_pixels = W * H
    block = min(n_pixels, cfg.ray_batch)
    spp_chunk = max(1, min(SPP, cfg.ray_batch // block))

    # compile warmup (sample_lo is traced: one compile covers the sweep)
    ids0 = jnp.arange(block, dtype=jnp.int32)
    t0 = time.time()
    out, alive = render_block_stats_jit(scene, cfg, ids0, 0, spp_chunk)
    np.asarray(out)
    print(f"compiled in {time.time()-t0:.1f}s", file=sys.stderr)

    nee = cfg.enable_nee and scene.n_lights > 0
    t0 = time.time()
    total_rays = 0.0
    last = None
    for start in range(0, n_pixels, block):
        bids = jnp.arange(start, min(start + block, n_pixels), dtype=jnp.int32)
        s = 0
        while s < SPP:
            k = min(spp_chunk, SPP - s)
            out, alive = render_block_stats_jit(scene, cfg, bids, s, k)
            s += k
            n_paths = int(bids.shape[0]) * k
            # segments: 1 camera ray per path + 1 per surviving bounce;
            # NEE adds 1 shadow ray per shading point (camera + bounces-1)
            a = alive  # device-side (max_bounces,)
            segs = n_paths + a.sum()
            shadow = (n_paths + a[:-1].sum()) if nee else 0.0
            total_rays += segs + shadow
            last = out
    total_rays = float(total_rays)  # forces sync on the accumulated stats
    np.asarray(last)
    dt = time.time() - t0

    mrays = total_rays / dt / 1e6
    metric_key = f"bunny_{W}x{H}_{SPP}spp"

    vs = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("metric_key") == metric_key and base.get("value", 0) > 0:
            vs = mrays / base["value"]
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump({"metric_key": metric_key, "value": mrays,
                       "unit": "Mrays/s", "backend": jax.default_backend()}, f)

    print(json.dumps({
        "metric": f"{metric_key}_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
