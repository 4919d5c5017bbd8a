"""Parity metrics: our render vs the reference's showcase goldens.

The reference's only correctness artifacts are showcase/1.{png,hdr} and
2.{png,hdr} (README.md:16-21), rendered from testscene.scn at 1280x720,
2048 spp, DOF on, NEE disabled (macos_main.mm:319-320, :612; the NEE
block is #if 0, ray.cpp:1285-1327). This module compares a render of the
same scene (any resolution) against the golden via:

- channel-mean relative error (global energy),
- Pearson correlation of tonemapped luminance (structure),
- SSIM-lite over 8x8 tiles (local structure).

Exact parity is NOT expected: we deliberately fix reference defects
(Schlick Fresnel orientation ray.cpp:826-831, cylinder cap normals
ray.cpp:330, refraction eta mixing ray.cpp:970) and use a different
sampler, so thresholds are structural, not bitwise.

Run:  PYTHONPATH=/root/repo python benchmarks/parity.py out/parity_testscene_320.hdr
"""

from __future__ import annotations

import json
import sys

import numpy as np

SHOWCASE = "/root/reference/showcase/1.hdr"


def box_down(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Integer-factor box downsample of (H, W, 3)."""
    H, W, _ = img.shape
    fh, fw = H // h, W // w
    img = img[: h * fh, : w * fw]
    return img.reshape(h, fh, w, fw, 3).mean((1, 3))


def tonemap_lum(img: np.ndarray) -> np.ndarray:
    lum = img @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    return lum / (1.0 + lum)


def perpixel_stats(ours: np.ndarray, golden: np.ndarray) -> dict:
    """Per-PIXEL relative luminance error stats (VERDICT r4 weak #3: the
    channel-mean energy metric alone overstated agreement). ``golden`` is
    box-downsampled to ours' resolution first."""
    h, w = ours.shape[:2]
    gold = golden if golden.shape[:2] == (h, w) else box_down(golden, h, w)
    la = ours.mean(-1)
    lb = gold.mean(-1)
    rel = np.abs(la - lb) / (lb + 1e-2)
    return {
        "perpix_median": round(float(np.median(rel)), 4),
        "perpix_p90": round(float(np.percentile(rel, 90)), 4),
        "perpix_frac_gt25": round(float((rel > 0.25).mean()), 4),
    }


def parity_metrics(ours: np.ndarray, golden: np.ndarray) -> dict:
    h, w = ours.shape[:2]
    gold = box_down(golden, h, w)
    mean_rel = float(
        np.abs(ours.mean((0, 1)) - gold.mean((0, 1))).sum()
        / max(gold.mean(), 1e-9) / 3)
    a = tonemap_lum(ours).ravel()
    b = tonemap_lum(gold).ravel()
    corr = float(np.corrcoef(a, b)[0, 1])

    # SSIM-lite over 8x8 tiles of tonemapped luminance
    ta = tonemap_lum(ours)[: h // 8 * 8, : w // 8 * 8]
    tb = tonemap_lum(gold)[: h // 8 * 8, : w // 8 * 8]
    ta = ta.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    tb = tb.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    mu_a, mu_b = ta.mean(1), tb.mean(1)
    va, vb = ta.var(1), tb.var(1)
    cov = ((ta - mu_a[:, None]) * (tb - mu_b[:, None])).mean(1)
    c1, c2 = 0.01**2, 0.03**2
    ssim = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
            / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2)))
    out = {"mean_rel_err": round(mean_rel, 4),
           "lum_corr": round(corr, 4),
           "ssim": round(float(ssim.mean()), 4)}
    out.update(perpixel_stats(ours, golden))
    return out


def main():
    from offline_raytracer_tpu.utils import hdr

    ours_path = sys.argv[1] if len(sys.argv) > 1 else "out/parity_testscene_320.hdr"
    golden_path = sys.argv[2] if len(sys.argv) > 2 else SHOWCASE
    ours = hdr.read_hdr(ours_path)
    golden = hdr.read_hdr(golden_path)
    m = parity_metrics(ours, golden)
    m["ours"] = ours_path
    m["golden"] = golden_path
    print(json.dumps(m))


if __name__ == "__main__":
    main()
