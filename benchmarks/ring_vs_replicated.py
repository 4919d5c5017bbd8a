"""Ring-sharded geometry vs replicated geometry: one timed step each.

The ring mode (parallel/ring.py) shards the BVH across the mesh and
ppermutes ray blocks around the ring accumulating min-t — the mode for
scenes whose geometry exceeds per-chip HBM. On a replicated-capable
scene it is expected to LOSE to replication (n_dev traversal rounds +
ICI hops vs one local traversal); this harness records that cost so the
crossover is a measured fact, not a guess (VERDICT r2/r3 ask).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
         python benchmarks/ring_vs_replicated.py
"""

import json
import os
import sys
import time


def main():
    import jax

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from offline_raytracer_tpu.config import RenderConfig
    from offline_raytracer_tpu.models.scenes import bunny
    from offline_raytracer_tpu.parallel.ring import render_block_ring
    from offline_raytracer_tpu.parallel.shard import make_mesh, render_block_sharded

    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(jax.devices()[:n_dev])
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    scene = bunny(W, W)
    cfg = RenderConfig(width=W, height=W, spp=spp, max_bounces=6,
                       enable_dof=False,
                       use_pallas=jax.default_backend() != "cpu")
    ids = jnp.arange(W * W, dtype=jnp.int32)

    def timed(f):
        out = f()
        out.block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = f()
            out.block_until_ready()
            best = min(best, time.time() - t0)
        return best

    t_rep = timed(lambda: render_block_sharded(scene, cfg, mesh, ids, 0, spp))
    t_ring = timed(lambda: render_block_ring(scene, cfg, mesh, ids, 0, spp))
    print(json.dumps({
        "metric": f"ring_vs_replicated_bunny_{W}_{spp}spp",
        "devices": n_dev,
        "replicated_s": round(t_rep, 3),
        "ring_s": round(t_ring, 3),
        "ring_slowdown": round(t_ring / t_rep, 2),
        "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
