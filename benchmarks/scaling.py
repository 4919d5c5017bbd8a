"""Device-count scaling benchmark: rays/s at 1, 2, 4, ... N devices.

Measures the shard_map data-parallel path (parallel/shard.py) against the
north-star target of >=85% rays/s scaling efficiency (BASELINE.md). On a
single-chip session, run with the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/scaling.py --spp 8 --size 128

On real hardware the same script spans all visible chips (and hosts, if
jax.distributed is initialized first). One JSON line per device count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bunny")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--multihost", action="store_true",
                    help="join a multi-host cluster before measuring: the"
                         " device counts then span hosts (>=85%% 1->N-host"
                         " scaling target, BASELINE.md)")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if args.multihost:
        from offline_raytracer_tpu.parallel.shard import init_multihost
        init_multihost(args.coordinator, args.num_processes, args.process_id)

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        # the axon TPU plugin overrides the env var; honor the intent
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from offline_raytracer_tpu.config import RenderConfig
    from offline_raytracer_tpu.models import scenes as presets
    from offline_raytracer_tpu.parallel.shard import make_mesh, render_block_sharded

    all_devs = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(all_devs)]
    scene = presets.BY_NAME[args.scene](args.size, args.size)
    cfg = RenderConfig(width=args.size, height=args.size, spp=args.spp,
                       max_bounces=8, enable_dof=False,
                       use_pallas=jax.default_backend() != "cpu")

    n_pixels = args.size * args.size
    base_rate = None
    for n in counts:
        mesh = make_mesh(all_devs[:n])
        pad = (-n_pixels) % n
        ids = jnp.arange(n_pixels + pad, dtype=jnp.int32) % n_pixels

        out = render_block_sharded(scene, cfg, mesh, ids)       # compile
        out.block_until_ready()
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            out = render_block_sharded(scene, cfg, mesh, ids)
            out.block_until_ready()
            best = min(best, time.time() - t0)
        rate = n_pixels * args.spp / best / 1e6
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print(json.dumps({
            "metric": f"{args.scene}_{args.size}_{args.spp}spp_scaling",
            "devices": n,
            "value": round(rate, 3), "unit": "Mpaths/s",
            "seconds": round(best, 3),
            "efficiency_vs_1dev": round(eff, 3),
            "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
