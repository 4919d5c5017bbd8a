"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric: Mrays/s on the bunny scene (BASELINE.json configs[2]: bunny.ply,
512x512, area light + NEE), forward path through the fused megakernel
(ops/mega.py). "Rays" counts every traced ray — path extension segments
plus NEE shadow rays — from the integrator's own alive-mask statistics,
not assumed from spp. The reference publishes no numbers (BASELINE.md),
so vs_baseline compares against the first value this harness ever
recorded on this hardware (bench_baseline.json, committed).

Before timing, the harness renders one block through ALL on-chip
traversal paths (mega / cull / jnp) and asserts they agree — the
real-hardware lowering check the Pallas kernels otherwise lack (their
unit tests run interpret=True on CPU; VERDICT r2 #5). A fwd+bwd render
step (jax.value_and_grad w.r.t. material albedo + mesh vertices) is
timed as well — the north-star metric of BASELINE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")

# back-of-envelope useful work per traced ray on the bunny wavefronts
# (leaf cull ~8.6k + front-to-back leaf sweeps ~20k + shading/NEE ~8k
# FLOPs; see benchmarks/profile_* for the derivation). Used only for the
# MFU estimate printed to stderr.
EST_FLOPS_PER_RAY = 37e3
# This workload is f32 VPU element-wise math, so the honest denominator is
# the VPU peak, not the 197 TFLOP/s bf16 MXU headline (ADVICE r3 #4):
# 8x128 lanes x 4 ALUs x 2 flops/FMA x ~0.94 GHz ~= 7.7 TFLOP/s on v5e.
PEAK_FLOPS = {"tpu": 7.7e12}
PEAK_LABEL = "v5e f32 VPU (~7.7 TF/s est)"


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from offline_raytracer_tpu.config import RenderConfig
    from offline_raytracer_tpu.models.scenes import bunny
    from offline_raytracer_tpu.render import (
        render_block_jit, render_block_stats_jit, tile_pixel_ids)

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
                       enable_dof=False, ray_batch=W * H)
    order = tile_pixel_ids(W, H)

    # ---- cross-path correctness on the real chip (VERDICT r2 #5) --------
    if not on_cpu:
        probe = jnp.asarray(order[: 4096])
        outs = {}
        for mode in ("mega", "cull", "jnp"):
            o = render_block_jit(
                scene, cfg.replace(traversal=mode), probe, 0, 2)
            outs[mode] = np.asarray(o)
        for mode in ("cull", "jnp"):
            a, b = outs["mega"], outs[mode]
            rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-2)
            assert abs(a.mean() - b.mean()) < 2e-3 * max(b.mean(), 1e-3), \
                f"mega vs {mode}: means {a.mean()} {b.mean()}"
            assert (rel > 1e-2).mean() < 0.005, \
                f"mega vs {mode}: {(rel > 1e-2).mean():.4f} pixels diverge"
        print("on-chip traversal cross-check: mega == cull == jnp",
              file=sys.stderr)

    # ---- forward throughput --------------------------------------------
    n_pixels = W * H
    block = min(n_pixels, cfg.ray_batch)
    spp_chunk = 4 if not on_cpu else 1

    ids0 = jnp.asarray(order[:block])
    t0 = time.time()
    out, alive = render_block_stats_jit(scene, cfg, ids0, 0, spp_chunk)
    np.asarray(out)
    compile_cold_s = time.time() - t0
    print(f"compiled in {compile_cold_s:.1f}s (this process)",
          file=sys.stderr)
    # warm = a FRESH process compiling the same program against the
    # persistent cache this run just populated — the deploy-relevant
    # number (the sample-chunk/replay unrolls trade cold-compile time
    # for step time; VERDICT r4 #8 wants both tracked)
    compile_warm_s = -1.0
    if not on_cpu:
        import subprocess
        warm_src = (
            "import os,time;"
            "os.environ['JAX_COMPILATION_CACHE_DIR']='/tmp/jax_cache';"
            "import jax,jax.numpy as jnp,numpy as np;"
            "jax.config.update('jax_compilation_cache_dir','/tmp/jax_cache');"
            "jax.config.update("
            "'jax_persistent_cache_min_compile_time_secs',0.0);"
            "from offline_raytracer_tpu.config import RenderConfig;"
            "from offline_raytracer_tpu.models.scenes import bunny;"
            "from offline_raytracer_tpu.render import "
            "render_block_stats_jit,tile_pixel_ids;"
            f"W=H={W};scene=bunny(W,H);"
            f"cfg=RenderConfig(width=W,height=H,spp={SPP},max_bounces=8,"
            "enable_dof=False,ray_batch=W*H);"
            "ids=jnp.asarray(tile_pixel_ids(W,H));t0=time.time();"
            f"o,a=render_block_stats_jit(scene,cfg,ids,0,{spp_chunk});"
            "np.asarray(o);print('WARM_S',time.time()-t0)")
        try:
            r = subprocess.run(
                [sys.executable, "-c", warm_src], capture_output=True,
                text=True, timeout=900,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in r.stdout.splitlines():
                if line.startswith("WARM_S"):
                    compile_warm_s = float(line.split()[1])
        except Exception as e:  # warm probe is best-effort diagnostics
            print(f"warm-compile probe failed: {e}", file=sys.stderr)
        print(f"warm compile (fresh process, persistent cache): "
              f"{compile_warm_s:.1f}s", file=sys.stderr)

    nee = cfg.enable_nee and scene.n_lights > 0
    t0 = time.time()
    launches = []   # (n_paths, device alive handle) — stats accumulate on
    #                 the HOST after the loop: folding the device scalars
    #                 into a running sum in-loop serialized every launch
    #                 on a ~25 ms dispatch round-trip (measured 3x total
    #                 slowdown, r5) and timed the tunnel, not the chip
    last = None
    for start in range(0, n_pixels, block):
        bids = jnp.asarray(order[start: min(start + block, n_pixels)])
        s = 0
        while s < SPP:
            k = min(spp_chunk, SPP - s)
            out, alive = render_block_stats_jit(scene, cfg, bids, s, k)
            s += k
            launches.append((int(bids.shape[0]) * k, alive))
            last = out
    total_rays = 0.0
    for n_paths, alive in launches:
        # segments: 1 camera ray per path + 1 per surviving bounce;
        # NEE adds 1 shadow ray per shading point (camera + bounces-1)
        a = np.asarray(alive)
        total_rays += n_paths + a.sum()
        if nee:
            total_rays += n_paths + a[:-1].sum()
    img = np.asarray(last)
    dt = time.time() - t0
    assert np.isfinite(img).all() and img.mean() > 0, "bench render broken"

    mrays = total_rays / dt / 1e6
    metric_key = f"bunny_{W}x{H}_{SPP}spp"
    peak = PEAK_FLOPS.get(jax.default_backend())
    if peak:
        mfu = mrays * 1e6 * EST_FLOPS_PER_RAY / peak
        print(f"MFU estimate: {mrays:.2f} Mrays/s x {EST_FLOPS_PER_RAY:.0f} "
              f"FLOPs/ray / {PEAK_LABEL} = {mfu*100:.2f}%", file=sys.stderr)

    # ---- testscene on the fast path (VERDICT r3 #2) ---------------------
    # the reference's only showcase scene, megakernel-hosted: cylinders +
    # box/mesh/cylinder lights in-kernel. Timed with the SAME 4-spp
    # chunked launches as the bunny loop (VERDICT r4 weak #7: 1-spp
    # launches measured dispatch latency, not the kernel).
    ts_mrays = 0.0
    ts_scn = os.environ.get(
        "RAYTRACER_REF_DATA", "/root/reference/data") + "/testscene.scn"
    if not on_cpu and os.path.exists(ts_scn):
        from offline_raytracer_tpu.scene.scn import load_scene
        from offline_raytracer_tpu.render import _mega_active

        TW, TH, TSPP = 320, 180, 16
        tscene, _ = load_scene(ts_scn, TW, TH)
        tcfg = RenderConfig(width=TW, height=TH, spp=TSPP, max_bounces=8,
                            enable_dof=False, ray_batch=4 * TW * TH)
        assert _mega_active(tscene, tcfg), "testscene must ride the mega path"
        torder = tile_pixel_ids(TW, TH)
        tids = jnp.asarray(torder)
        out, talive = render_block_stats_jit(tscene, tcfg, tids, 0, 4)
        np.asarray(out)   # compile
        t0 = time.time()
        t_launches = []
        for s in range(0, TSPP, 4):
            out, talive = render_block_stats_jit(tscene, tcfg, tids, s, 4)
            t_launches.append(talive)
        t_rays = 0.0
        for talive in t_launches:
            ta = np.asarray(talive)
            t_rays += 2 * TW * TH * 4 + ta.sum() + ta[:-1].sum()
        ts_dt = time.time() - t0
        assert np.isfinite(np.asarray(out)).all()
        ts_mrays = t_rays / ts_dt / 1e6
        print(f"testscene {TW}x{TH}: {ts_mrays:.2f} Mrays/s "
              f"(mega path, 4-spp chunks)", file=sys.stderr)
    elif not on_cpu:
        print(f"testscene skipped: {ts_scn} not found "
              f"(set RAYTRACER_REF_DATA)", file=sys.stderr)

    # ---- compiled shard_map+Pallas and ring on the real chip ------------
    # (VERDICT r4 #6: these combinations previously ran only in interpret
    # mode on the CPU mesh). Mesh((1,)) is the only real topology here;
    # it still compiles the actual sharded program a pod would run, and
    # the ring step exercises a compiled self-ppermute.
    if not on_cpu:
        from offline_raytracer_tpu.parallel.ring import render_block_ring
        from offline_raytracer_tpu.parallel.shard import (
            make_mesh, render_block_sharded)

        mesh = make_mesh()
        probe = jnp.asarray(order[n_pixels // 2: n_pixels // 2 + 4096])
        sh_out = np.asarray(render_block_sharded(
            scene, cfg, mesh, probe, 0, 2))
        ref_out = np.asarray(render_block_jit(scene, cfg, probe, 0, 2))
        np.testing.assert_allclose(sh_out, ref_out, rtol=1e-5, atol=1e-6)
        ring_out = np.asarray(render_block_ring(
            scene, cfg.replace(max_bounces=4), mesh, probe, 0, 1))
        assert np.isfinite(ring_out).all() and ring_out.mean() >= 0
        print(f"shard_map+mega on Mesh(({mesh.size},)): == unsharded; "
              f"ring step (self-ppermute) compiled OK", file=sys.stderr)

    # ---- fwd+bwd throughput (north-star metric) -------------------------
    # gradient step w.r.t. material albedo + mesh vertices. On TPU the
    # default "auto" route is the megakernel with path-replay backprop
    # (replay.py): forward = one fused launch, backward = traversal-free
    # XLA replay of the recorded hits.
    # replay_tiers stays () here: measured on-chip (r5, BASELINE.md), the
    # backward is SCATTER-bound on parameter gradients, which scale with
    # hit count (concentrated at bounces 0-1) — compacting the thin late
    # bounces moves little, and the compaction's own gathers add VJP
    # scatters. The tiers are implemented + equality-tested
    # (tests/test_replay.py) for scenes/hardware where they pay.
    # grad_mode="replay-value": the descent-loop route — forward value
    # comes from the XLA replay of the kernel's records (same estimator,
    # same draws; tests/test_replay.py pins kernel == replay radiance) and
    # plain autodiff lets XLA DCE the cotangents this loss doesn't use.
    # The custom_vjp "kernel-value" route computes every scene cotangent
    # (+~21 ms/step here, benchmarks/profile_grad.py).
    gcfg = cfg.replace(traversal="auto" if not on_cpu else "jnp",
                       max_bounces=8, grad_mode="replay-value")
    gids = jnp.asarray(order[: min(n_pixels, 1 << 16)])

    from offline_raytracer_tpu.render import render_block

    def loss_fn(diffuse, v0):
        sc = scene.replace(
            materials=scene.materials.replace(diffuse=diffuse),
            triangles=scene.triangles.replace(v0=v0))
        return jnp.mean(render_block(sc, gcfg, gids, 0, 1))

    grad_step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    args = (scene.materials.diffuse, scene.triangles.v0)
    t0 = time.time()
    loss, grads = grad_step(*args)
    np.asarray(loss)   # block_until_ready does not sync on the axon
    #                    dispatch path; a host transfer does
    gcompile_s = time.time() - t0
    # per-step ray count from the same config's alive stats
    _, galive = render_block_stats_jit(scene, gcfg, gids, 0, 1)
    ga = np.asarray(galive)
    g_paths = int(gids.shape[0])
    g_rays = g_paths + ga.sum() + (g_paths + ga[:-1].sum() if nee else 0.0)
    reps = 1 if on_cpu else 4
    t0 = time.time()
    for _ in range(reps):
        loss, grads = grad_step(*args)
    np.asarray(loss)   # one sync after the enqueued reps: the device
    #                    stream executes them in order
    g_dt = (time.time() - t0) / reps
    g_mrays = float(g_rays) / g_dt / 1e6
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    print(f"fwd+bwd: {g_mrays:.3f} Mrays/s (loss {float(loss):.5f}, "
          f"grad compile {gcompile_s:.1f}s)", file=sys.stderr)

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
        "value": round(float(mrays), 3),
        "unit": "Mrays/s",
        "vs_baseline": round(float(vs), 3),
        "fwd_bwd_mrays": round(float(g_mrays), 3),
        "testscene_mrays": round(float(ts_mrays), 3),
        "compile_cold_s": round(compile_cold_s, 1),
        "compile_warm_s": round(compile_warm_s, 1),
    }))


if __name__ == "__main__":
    main()
