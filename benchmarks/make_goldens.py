"""Render + commit the parity goldens (VERDICT r3 #3).

Renders the two showcase-relevant configs at a REPRODUCIBLE, committed
configuration and writes everything the judge needs into goldens/:

- testscene (BASELINE configs[4]) in reference mode — NEE/MIS off, DOF on,
  fixed roughness 0.01 — the estimator the reference's showcase images
  used (macos_main.mm:319-320, NEE dead at ray.cpp:1285-1327);
- dwarf + DOF (BASELINE configs[3]), never rendered before round 4;
- goldens/parity.json: the parity metrics vs /root/reference/showcase/1.hdr
  plus the exact RenderConfig used, so the numbers are reproducible.

Run: PYTHONPATH=/root/repo python benchmarks/make_goldens.py [--fast]
(--fast drops resolution/spp for a smoke run; committed goldens use the
default settings on the TPU chip).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

GOLD_DIR = os.path.join(os.path.dirname(__file__), "..", "goldens")
SHOWCASE = "/root/reference/showcase/1.hdr"


def tonemap_png(img: np.ndarray, path: str):
    from offline_raytracer_tpu.utils import hdr
    hdr.write_png(path, hdr.tonemap(img))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from parity import parity_metrics

    from offline_raytracer_tpu.config import RenderConfig
    from offline_raytracer_tpu.models.scenes import dwarf, testscene
    from offline_raytracer_tpu.render import render_image
    from offline_raytracer_tpu.utils import hdr

    fast = "--fast" in sys.argv
    os.makedirs(GOLD_DIR, exist_ok=True)
    out = {}

    # ---- testscene, reference estimator -------------------------------
    W, H = (160, 90) if fast else (640, 360)
    SPP = 8 if fast else 256
    cfg = RenderConfig(
        width=W, height=H, spp=SPP, max_bounces=12,
        enable_nee=False, enable_mis=False, pixel_jitter=False,
        enable_dof=True, default_roughness=0.01,
        reference_rr_quirk=True,
        ray_batch=1 << 15 if fast else 1 << 17)
    scene, _ = __import__(
        "offline_raytracer_tpu.scene.scn", fromlist=["load_scene"]
    ).load_scene("/root/reference/data/testscene.scn", W, H)
    t0 = time.time()
    img = render_image(scene, cfg)
    dt = time.time() - t0
    print(f"testscene {W}x{H}x{SPP}spp in {dt:.1f}s mean={img.mean():.4f}",
          file=sys.stderr)
    hdr.write_hdr(os.path.join(GOLD_DIR, "testscene.hdr"), img)
    try:
        tonemap_png(img, os.path.join(GOLD_DIR, "testscene.png"))
    except Exception:
        pass
    golden = hdr.read_hdr(SHOWCASE)
    m = parity_metrics(img, golden)

    # ---- noise-floor calibration (VERDICT r4 #3) ------------------------
    # (a) OUR two-seed floor: the same committed config at seed 1 — the
    #     per-pixel self error is pure MC noise at our spp;
    # (b) the REFERENCE's own floor: showcase/2.hdr is the same scene
    #     re-rendered (lum corr 0.995, energy ratio 1.0005 — measured
    #     r5), so showcase1-vs-showcase2 is the reference's self noise at
    #     2048 spp. Together these separate noise from residual bias.
    from parity import perpixel_stats
    t0 = time.time()
    img_b = render_image(scene, cfg.replace(seed=1))
    print(f"second-seed render in {time.time()-t0:.1f}s", file=sys.stderr)
    self_floor = perpixel_stats(img, img_b)
    golden2 = hdr.read_hdr(SHOWCASE.replace("1.hdr", "2.hdr"))
    ref_floor = perpixel_stats(golden, golden2)   # full-res reference self
    m["noise_floor_self"] = self_floor
    m["noise_floor_showcase_pair"] = ref_floor
    m["bias_ratio_median"] = round(
        m["perpix_median"] / max(self_floor["perpix_median"], 1e-6), 3)
    out["testscene"] = {
        "metrics": m, "render_s": round(dt, 1),
        "config": dataclasses.asdict(cfg),
        "golden": SHOWCASE,
        "showcase2_note": (
            "showcase/2.hdr is the same testscene render repeated "
            "(README.md:16-21); used here as the reference's own "
            "two-render noise floor rather than a second target"),
        "backend": jax.default_backend(),
    }
    print("testscene parity:", m, file=sys.stderr)

    # ---- dwarf + DOF (configs[3]) --------------------------------------
    W2, H2 = (128, 128) if fast else (512, 512)
    SPP2 = 8 if fast else 256
    cfg2 = RenderConfig(width=W2, height=H2, spp=SPP2, max_bounces=8,
                        enable_dof=True, enable_nee=True, enable_mis=True,
                        ray_batch=1 << 15 if fast else 1 << 17)
    scene2 = dwarf(W2, H2)
    t0 = time.time()
    img2 = render_image(scene2, cfg2)
    dt2 = time.time() - t0
    print(f"dwarf {W2}x{H2}x{SPP2}spp in {dt2:.1f}s mean={img2.mean():.4f}",
          file=sys.stderr)
    assert np.isfinite(img2).all() and img2.mean() > 0
    hdr.write_hdr(os.path.join(GOLD_DIR, "dwarf_dof.hdr"), img2)
    try:
        tonemap_png(img2, os.path.join(GOLD_DIR, "dwarf_dof.png"))
    except Exception:
        pass
    out["dwarf_dof"] = {
        "render_s": round(dt2, 1), "mean": float(img2.mean()),
        "config": dataclasses.asdict(cfg2),
        "backend": jax.default_backend(),
    }

    with open(os.path.join(GOLD_DIR, "parity.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"testscene": out["testscene"]["metrics"]}))


if __name__ == "__main__":
    main()
