"""Fused wavefront megakernel: the whole bounce loop in ONE Pallas kernel.

The reference's hot loop is a single function — per ray: traverse, shade,
sample, repeat (tiled_raytrace_bvh, ray.cpp:1178-1466). Rounds 1-2 ran
only *traversal* on-chip; per bounce the full SoA wavefront round-tripped
HBM through XLA for ray sorting, hit refinement, BSDF, NEE and RNG. This
module is the TPU answer at the same altitude as the reference: one
pallas_call whose grid walks (SUB, 128)-ray blocks, and for each block the
ENTIRE path trace — every bounce — runs with ray state resident in VMEM:

- analytic primitives (spheres, boxes, cylinders): dense branch-free
  plane math, prim parameters read as SMEM scalars (ray.cpp:132-352
  physics);
- triangles: per-128-ray-row leaf cull against the packed LBVH's leaf
  AABBs (leaves on the sublane axis) + the affine-barycentric 128-tri
  sweep of ops/bvh.py, with winner normal/material gathered in-sweep by
  masked lane reduction — no refine pass, no gathers, no ray sorts;
- emissive accumulation with MIS, NEE against ANY light kind (the light
  point/normal/emit/pdf are sampled outside by ops/lights.sample_lights
  and ride in as input planes) with an in-kernel any-hit shadow
  traversal, Russian roulette, and the 3-lobe BSDF (ops/bsdf.py
  physics) — all as (SUB, 128) vector-plane ops;
- per-bounce uniforms are precomputed OUTSIDE with the exact threefry
  draws of the jnp integrator (utils/rng.bounce_uniforms), so results are
  sharding-invariant and directly comparable against integrator.py;
- per-bounce hit RECORDS (winning prim id + NEE visibility) are emitted
  so gradients flow through a traversal-free differentiable replay
  (replay.py + integrator.trace_paths(replay=...)) — path-replay
  backprop in the detached-discontinuity regime.

Scenes it cannot host (BVH beyond VMEM, >128 of any prim table) fall
back to the cull/packet paths (ops/traverse.py dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from offline_raytracer_tpu.ops.bvh import TriBVH

import os as _os0

INF = 3.4e38
BIGI = 1 << 30
LANE = 128
SUB = int(_os0.environ.get("MEGA_SUB", "8"))
BLOCK = SUB * LANE
PI = 3.14159265358979

PARK = 1e8  # parked-lane origin (integrator.PARK_ORIGIN)


# consts row layout (built by pack_consts; offsets in MegaMeta)
N_SPH_ROWS = 5    # cx cy cz r mat
N_BOX_ROWS = 7    # x0 y0 z0 x1 y1 z1 mat
N_CYL_ROWS = 15   # bx by bz r h rot(9, row-major world->local) mat
N_MAT_ROWS = 18   # kd3 ks3 kt3 ior emit3 is_light to_light rough pd_c ps_c
N_LGT_ROWS = 1    # inv_areaL = 1/(area * n_lights), any light kind


class MegaMeta:
    """Static (trace-time) layout info for the consts array."""

    def __init__(self, ns, nb, nc, nm, nl):
        self.ns, self.nb, self.nc, self.nm, self.nl = ns, nb, nc, nm, nl
        self.SPH = 0
        self.BOX = self.SPH + N_SPH_ROWS
        self.CYL = self.BOX + N_BOX_ROWS
        self.MAT = self.CYL + N_CYL_ROWS
        self.LGT = self.MAT + N_MAT_ROWS
        self.rows = self.LGT + N_LGT_ROWS
        # hit-record id encoding (ops/intersect.hit_from_ids decodes):
        # [0, ns) sphere, [ns, ns+nb) box, [.., +nc) cylinder, then BVH
        # triangle SLOTS (leaf*128 + lane); -1 = miss
        self.tri_base = ns + nb + nc


def mega_ok(scene, cfg) -> bool:
    """Can the megakernel host this scene?  Static-shape checks only."""
    from offline_raytracer_tpu.ops import traverse_cull as tc

    if scene.materials.ior.shape[0] > LANE:
        return False
    if (scene.spheres.radius.shape[0] > LANE
            or scene.boxes.mat.shape[0] > LANE
            or scene.cylinders.radius.shape[0] > LANE):
        return False
    if scene.lights.kind.shape[0] > LANE:
        return False
    bvh = scene.tri_bvh
    if scene.triangles.mat.shape[0] > 0:
        if bvh is None or not (tc.cull_ok(bvh) and tc.fits_vmem(bvh)):
            return False
        # this kernel's own footprint: the leaf-major (M, 8, 256) stack
        # is 8*256/13*128 ~= 1.23x the cull kernel's coefficient planes
        from offline_raytracer_tpu.ops.traverse_pallas import VMEM_BUDGET
        M = bvh.planes.shape[1]
        leafmm_bytes = M * 8 * 2 * LANE * 4
        temps = 8 * LANE * LANE * 4
        if leafmm_bytes + temps + (1 << 20) >= VMEM_BUDGET:
            return False
    return True


def _row(x, fill=0.0):
    x = jnp.asarray(x, jnp.float32).reshape(-1)
    return jnp.pad(x, (0, LANE - x.shape[0]), constant_values=fill)


def pack_consts(scene, cfg):
    """Scene tables -> ((rows, 128) f32 consts, MegaMeta). jnp-traceable."""
    sph, box, cyl, mats, lights = (
        scene.spheres, scene.boxes, scene.cylinders, scene.materials,
        scene.lights)
    ns = sph.radius.shape[0]
    nb = box.mat.shape[0]
    nc = cyl.radius.shape[0]
    nm = mats.ior.shape[0]
    nl = lights.kind.shape[0]
    meta = MegaMeta(ns, nb, nc, nm, nl)

    rows = []
    # spheres (pad center far away so pad lanes never hit)
    rows += [_row(sph.center[:, 0], PARK), _row(sph.center[:, 1], PARK),
             _row(sph.center[:, 2], PARK), _row(sph.radius, 0.0),
             _row(sph.mat, 0.0)]
    # boxes (pad = inverted box)
    rows += [_row(box.bmin[:, 0], INF), _row(box.bmin[:, 1], INF),
             _row(box.bmin[:, 2], INF), _row(box.bmax[:, 0], -INF),
             _row(box.bmax[:, 1], -INF), _row(box.bmax[:, 2], -INF),
             _row(box.mat, 0.0)]
    # cylinders (base, radius, height, world->local rotation rows;
    # reference physics ray.cpp:286-352, ops/intersect.cylinder_hit_one)
    rows += [_row(cyl.base[:, 0], PARK), _row(cyl.base[:, 1], PARK),
             _row(cyl.base[:, 2], PARK), _row(cyl.radius, 0.0),
             _row(jnp.linalg.norm(cyl.axis, axis=-1) if nc else cyl.radius,
                  0.0)]
    for i in range(3):
        for j in range(3):
            rows += [_row(cyl.rot[:, i, j], 1.0 if i == j else 0.0)]
    rows += [_row(cyl.mat, 0.0)]
    # materials
    if cfg.roughness_from_material:
        rough = jnp.sqrt(2.0 / (mats.spec_exp + 2.0))
    else:
        rough = jnp.full_like(mats.ior, cfg.default_roughness)
    ld = jnp.linalg.norm(mats.diffuse, axis=-1)
    ls = jnp.linalg.norm(mats.specular, axis=-1)
    lt = jnp.linalg.norm(mats.transmission, axis=-1)
    s = jnp.maximum(ld + ls + lt, 1e-12)
    rows += [_row(mats.diffuse[:, k]) for k in range(3)]
    rows += [_row(mats.specular[:, k]) for k in range(3)]
    rows += [_row(mats.transmission[:, k]) for k in range(3)]
    rows += [_row(jnp.maximum(mats.ior, 1.0), 1.0)]
    rows += [_row(mats.emit[:, k]) for k in range(3)]
    rows += [_row(mats.is_light.astype(jnp.float32)),
             _row(scene.mat_to_light, -1.0), _row(rough, 1.0),
             _row(ld / s), _row(ls / s)]
    # lights: only the area pdf is needed in-kernel (for the MIS weight on
    # emissive BSDF hits); NEE sample points/normals/emit arrive as input
    # planes computed by ops/lights.sample_lights outside the kernel —
    # which is what makes every light KIND (sphere/cylinder/mesh/box)
    # kernel-hostable.
    if nl:
        rows += [_row(1.0 / (jnp.maximum(lights.area, 1e-12) * nl))]
    else:
        rows += [jnp.zeros((LANE,), jnp.float32)] * N_LGT_ROWS
    return jnp.stack(rows), meta


# ---------------------------------------------------------------------------
# plane-vector helpers: a vector is a tuple (x, y, z) of (SUB, LANE) planes
# ---------------------------------------------------------------------------


def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vscale(s, a):
    return (s * a[0], s * a[1], s * a[2])


def vneg(a):
    return (-a[0], -a[1], -a[2])


def vwhere(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def vnormalize(a, eps=1e-8):
    inv = jax.lax.rsqrt(jnp.maximum(vdot(a, a), eps * eps))
    return vscale(inv, a)


def vcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _pow5(m):
    m2 = m * m
    return m2 * m2 * m


# ---------------------------------------------------------------------------
# 3-lobe BSDF on planes — exact transcription of ops/bsdf.py
# (eval_scattering / pdf_brdf / sample_brdf physics, ray.cpp:824-1161,
# with the same reference-defect fixes; see ops/bsdf.py docstring)
# ---------------------------------------------------------------------------


def _schlick(ks, cos_d):
    m = jnp.clip(1.0 - jnp.abs(cos_d), 0.0, 1.0)
    p5 = _pow5(m)
    return (ks[0] + (1.0 - ks[0]) * p5,
            ks[1] + (1.0 - ks[1]) * p5,
            ks[2] + (1.0 - ks[2]) * p5)


def _ggx_d(n_dot_h, rough):
    a2 = rough * rough
    c = jnp.clip(n_dot_h, 1e-6, 1.0)
    c2 = c * c
    tan2 = (1.0 - c2) / c2
    denom = PI * c2 * c2 * (a2 + tan2) ** 2
    d = a2 / jnp.maximum(denom, 1e-20)
    return jnp.where(n_dot_h > 0.0, d, 0.0)


def _smith_g1(w, n, m, rough):
    w_dot_n = vdot(w, n)
    w_dot_m = vdot(w, m)
    same_side = (w_dot_n * w_dot_m) > 0.0
    c2 = jnp.clip(w_dot_n * w_dot_n, 1e-9, 1.0)
    tan2 = (1.0 - c2) / c2
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + rough * rough * tan2))
    return jnp.where(same_side, g, 0.0)


def _etas(n_dot_wo, ior):
    outside = n_dot_wo >= 0.0
    eta_wo = jnp.where(outside, 1.0, ior)
    eta_wi = jnp.where(outside, ior, 1.0)
    return eta_wo, eta_wi


def eval_bsdf_pl(n, wi, wo, mp, distance):
    """f(wi,wo)*|wi.N| as rgb plane triple (ops/bsdf.py eval_bsdf)."""
    n_dot_wi = vdot(wi, n)
    n_dot_wo = vdot(wo, n)
    same_side = (n_dot_wi * n_dot_wo) > 0.0

    ed = tuple(jnp.where(same_side, k / PI, 0.0) for k in mp["kd"])

    sgn_wi = jnp.sign(n_dot_wi)
    h = vscale(sgn_wi, vnormalize(vadd(wi, wo)))
    wi_dot_h = vdot(wi, h)
    f_spec = _schlick(mp["ks"], wi_dot_h)
    d_spec = _ggx_d(vdot(n, h), mp["rough"])
    g_spec = _smith_g1(wi, n, h, mp["rough"]) * _smith_g1(wo, n, h, mp["rough"])
    denom_s = 4.0 * jnp.maximum(jnp.abs(n_dot_wi) * jnp.abs(n_dot_wo), 1e-6)
    spec_scale = d_spec * g_spec / denom_s
    ks2 = vdot(mp["ks"], mp["ks"])
    h_faces_wi = wi_dot_h * sgn_wi > 0.0   # side-consistent (ops/bsdf.py)
    has_spec = (ks2 > 0.0) & h_faces_wi & same_side
    es = tuple(jnp.where(has_spec, f * spec_scale, 0.0) for f in f_spec)

    eta_wo, eta_wi = _etas(n_dot_wo, mp["ior"])
    ht = vneg(vadd(vscale(eta_wo, wo), vscale(eta_wi, wi)))
    m = vnormalize(ht)
    m = vscale(jnp.sign(vdot(m, n)), m)
    wo_dot_m = vdot(wo, m)
    wi_dot_m = vdot(wi, m)
    eta = eta_wo / eta_wi

    inside = n_dot_wo < 0.0
    att = tuple(
        jnp.where(inside,
                  jnp.exp(distance * jnp.log(jnp.clip(k, 1e-6, 1.0))), 1.0)
        for k in mp["kt"])

    d_t = _ggx_d(vdot(n, m), mp["rough"])
    g_t = _smith_g1(wi, n, m, mp["rough"]) * _smith_g1(wo, n, m, mp["rough"])
    f_t = _schlick(mp["ks"], wi_dot_m)
    jac_denom = (eta_wo * wo_dot_m + eta_wi * wi_dot_m) ** 2
    denom_t = jnp.maximum(
        jnp.abs(n_dot_wi) * jnp.abs(n_dot_wo) * jnp.maximum(jac_denom, 1e-9),
        1e-9)
    num_t = d_t * g_t * jnp.abs(wi_dot_m) * jnp.abs(wo_dot_m) * eta_wi * eta_wi
    t_scale = num_t / denom_t
    et_refract = tuple(
        jnp.where(~same_side, (1.0 - f) * t_scale, 0.0) for f in f_t)
    # TIR classified at the REFLECTION half vector h (ops/bsdf.py)
    wo_dot_h = vdot(wo, h)
    radicand_h = 1.0 - eta * eta * (1.0 - wo_dot_h * wo_dot_h)
    es_tir_on = same_side & (radicand_h < 0.0) & h_faces_wi
    es_tir = tuple(jnp.where(es_tir_on, f * spec_scale, 0.0) for f in f_spec)
    kt2 = vdot(mp["kt"], mp["kt"])
    has_trans = kt2 > 0.0
    et = tuple(
        jnp.where(has_trans, a * jnp.where(same_side, ei, er), 0.0)
        for a, ei, er in zip(att, es_tir, et_refract))

    aw = jnp.abs(n_dot_wi)
    return tuple(aw * (d + s_ + t_) for d, s_, t_ in zip(ed, es, et))


def pdf_bsdf_pl(n, wi, wo, mp):
    """Mixture pdf (ops/bsdf.py pdf_bsdf)."""
    pd_c, ps_c = mp["pd_c"], mp["ps_c"]
    pt_c = jnp.maximum(1.0 - pd_c - ps_c, 0.0)
    n_dot_wi = vdot(wi, n)
    n_dot_wo = vdot(wo, n)

    pd = jnp.maximum(n_dot_wi * jnp.sign(n_dot_wo), 0.0) / PI
    same_side = (n_dot_wi * n_dot_wo) > 0.0

    h = vscale(jnp.sign(n_dot_wi), vnormalize(vadd(wi, wo)))
    wi_dot_h = vdot(wi, h)
    n_dot_h = vdot(n, h)
    d_spec = _ggx_d(n_dot_h, mp["rough"])
    ps = d_spec * jnp.abs(n_dot_h) / jnp.maximum(4.0 * jnp.abs(wi_dot_h), 1e-9)
    ps = jnp.where(same_side, ps, 0.0)

    eta_wo, eta_wi = _etas(n_dot_wo, mp["ior"])
    m = vnormalize(vneg(vadd(vscale(eta_wo, wo), vscale(eta_wi, wi))))
    m = vscale(jnp.sign(vdot(m, n)), m)
    wo_dot_m = vdot(wo, m)
    wi_dot_m = vdot(wi, m)
    eta = eta_wo / eta_wi
    d_t = _ggx_d(vdot(n, m), mp["rough"])
    jac_denom = jnp.maximum((eta_wo * wo_dot_m + eta_wi * wi_dot_m) ** 2, 1e-9)
    pt_refract = (d_t * jnp.abs(vdot(n, m)) * eta_wi * eta_wi
                  * jnp.abs(wi_dot_m) / jac_denom)
    pt_refract = jnp.where(same_side, 0.0, pt_refract)
    # TIR pairs: specular-shaped density at h (ops/bsdf.py pdf_bsdf)
    wo_dot_h = vdot(wo, h)
    radicand_h = 1.0 - eta * eta * (1.0 - wo_dot_h * wo_dot_h)
    pt = jnp.where(same_side, jnp.where(radicand_h < 0.0, ps, 0.0),
                   pt_refract)
    return pd_c * pd + ps_c * ps + pt_c * pt


def _frame_to_world_pl(lx, ly, lz, n):
    """utils/math.frame_to_world on planes (same pole-safe frame)."""
    nx, ny, nz = n
    near_pole = jnp.abs(nz) > 0.999
    inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny, 1e-16))
    b0 = vwhere(near_pole,
                (jnp.ones_like(nz), jnp.zeros_like(nz), jnp.zeros_like(nz)),
                (-ny * inv, nx * inv, jnp.zeros_like(nz)))
    t = vnormalize(vcross(b0, n))
    b = vcross(n, t)
    return vadd(vadd(vscale(lx, t), vscale(ly, b)), vscale(lz, n))


def sample_bsdf_pl(e0, e1, choice, n, wo, mp):
    """(wi triple, is_transmission) — ops/bsdf.py sample_bsdf."""
    pd_c, ps_c = mp["pd_c"], mp["ps_c"]
    phi = 2.0 * PI * e1
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)

    n_dot_wo = vdot(wo, n)
    n_face = vscale(jnp.sign(n_dot_wo), n)

    cos_d = jnp.sqrt(e0)
    sin_d = jnp.sqrt(jnp.clip(1.0 - e0, 0.0, 1.0))
    wi_diffuse = _frame_to_world_pl(sin_d * cphi, sin_d * sphi, cos_d, n_face)

    a2e = mp["rough"] * mp["rough"] * e0 / jnp.maximum(1.0 - e0, 1e-9)
    cos_m = jax.lax.rsqrt(1.0 + a2e)
    sin_m = jnp.sqrt(jnp.clip(1.0 - cos_m * cos_m, 0.0, 1.0))
    m = _frame_to_world_pl(sin_m * cphi, sin_m * sphi, cos_m, n_face)

    wo_dot_m = vdot(wo, m)
    wi_spec = vsub(vscale(2.0 * jnp.abs(wo_dot_m), m), wo)

    eta_wo, eta_wi = _etas(n_dot_wo, mp["ior"])
    eta = eta_wo / eta_wi
    radicand = 1.0 - eta * eta * (1.0 - wo_dot_m * wo_dot_m)
    tir = radicand < 0.0
    sq = jnp.sqrt(jnp.clip(radicand, 0.0, 1.0))
    # m faces wo (sampled around n_face) => transmitted side is -m: -sq,
    # NOT the reference's -sign(wo.N)*sq unflipped-m form (ops/bsdf.py)
    wi_refract = vsub(vscale(eta * wo_dot_m - sq, m), vscale(eta, wo))
    wi_trans = vwhere(tir, wi_spec, wi_refract)

    pick_d = choice < pd_c
    pick_s = (~pick_d) & (choice < pd_c + ps_c)
    wi = vwhere(pick_d, wi_diffuse, vwhere(pick_s, wi_spec, wi_trans))
    is_trans = (~pick_d) & (~pick_s) & (~tir)
    return vnormalize(wi), is_trans


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _mega_kernel(
    rays_ref, u_ref, ls_ref, leafmm_ref, leaf_ref, consts_ref,
    out_ref, rad_ref, cnt_ref,
    st, hv, hm, hi, sh, kf,
    *, meta: MegaMeta, L: int, m_occ: int, has_tris: bool,
    t_min: float, hit_eps: float,
    rr_p: float, b_start: int, rr_start: int, n_fused: int,
    do_nee: bool, do_mis: bool,
    ref_rr_quirk: bool = False,
    trip_leaves: int = 2,
    kf_lane: bool = True, extract_enc: bool = True,
    ablate: str = "none",
    debug_counters: bool = False, interpret_exact: bool = False,
):
    """ONE bounce for one (SUB, 128)-ray block.

    State planes in/out: [0:3] origin, [3:6] direction, [6:9] throughput,
    [9] prev_pdf, [10] alive. rad_ref gets this bounce's radiance DELTA
    in planes [0:3] plus the bounce's hit RECORD: [3] = winning prim id
    (MegaMeta encoding, -1 miss; exact in f32 below 2^24) and [4] = NEE
    shadow visibility — the residuals the differentiable replay pass
    (integrator.trace_paths(replay=...)) consumes. ls_ref carries the
    bounce's NEE light samples (point, normal, emit, area pdf) computed
    outside by ops/lights.sample_lights from the same threefry draws the
    XLA integrator uses. The host wrapper loops bounces with wavefront
    compaction in between (dead lanes partitioned to tail blocks, which
    skip everything here).
    """
    f0 = jnp.zeros((SUB, LANE), jnp.float32)
    i0 = jnp.zeros((SUB, LANE), jnp.int32)

    def sphere_consider(j, o, d, bt, bn, bm, bi):
        cx = consts_ref[meta.SPH + 0, j]
        cy = consts_ref[meta.SPH + 1, j]
        cz = consts_ref[meta.SPH + 2, j]
        r = consts_ref[meta.SPH + 3, j]
        mt = consts_ref[meta.SPH + 4, j].astype(jnp.int32)
        rel = (o[0] - cx, o[1] - cy, o[2] - cz)
        b = vdot(d, rel)
        c = vdot(rel, rel) - r * r
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        tn, tp = -b - sq, -b + sq
        t = jnp.where(tn >= t_min, tn, tp)
        ok = (disc > 0.0) & (t >= t_min) & (t < bt)
        n = vadd(rel, vscale(t, d))
        return (jnp.where(ok, t, bt), vwhere(ok, n, bn),
                jnp.where(ok, mt, bm), jnp.where(ok, j, bi))

    def box_consider(j, o, d, bt, bn, bm, bi):
        x0 = consts_ref[meta.BOX + 0, j]
        y0 = consts_ref[meta.BOX + 1, j]
        z0 = consts_ref[meta.BOX + 2, j]
        x1 = consts_ref[meta.BOX + 3, j]
        y1 = consts_ref[meta.BOX + 4, j]
        z1 = consts_ref[meta.BOX + 5, j]
        mt = consts_ref[meta.BOX + 6, j].astype(jnp.int32)
        ivx, ivy, ivz = 1.0 / d[0], 1.0 / d[1], 1.0 / d[2]
        ax0, bx0 = (x0 - o[0]) * ivx, (x1 - o[0]) * ivx
        ay0, by0 = (y0 - o[1]) * ivy, (y1 - o[1]) * ivy
        az0, bz0 = (z0 - o[2]) * ivz, (z1 - o[2]) * ivz
        tnx, tfx = jnp.minimum(ax0, bx0), jnp.maximum(ax0, bx0)
        tny, tfy = jnp.minimum(ay0, by0), jnp.maximum(ay0, by0)
        tnz, tfz = jnp.minimum(az0, bz0), jnp.maximum(az0, bz0)
        t_en = jnp.maximum(jnp.maximum(tnx, tny), tnz)
        t_ex = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
        inner = t_en < t_min
        t = jnp.where(inner, t_ex, t_en)
        ok = (t_ex >= jnp.maximum(t_en, t_min)) & (t >= t_min) & (t < bt)
        # winning slab axis: first argmax of tn (entry) / argmin of tf (exit)
        # (select-on-bool is spelled with logical ops: Mosaic has no i1 select)
        w0_ex = (tfx <= tfy) & (tfx <= tfz)
        w0_en = (tnx >= tny) & (tnx >= tnz)
        w0 = (inner & w0_ex) | (~inner & w0_en)
        w1 = (~w0) & ((inner & (tfy <= tfz)) | (~inner & (tny >= tnz)))
        w2 = (~w0) & (~w1)
        flip = jnp.where(inner, 1.0, -1.0)
        n = (jnp.where(w0, flip * jnp.sign(d[0]), 0.0),
             jnp.where(w1, flip * jnp.sign(d[1]), 0.0),
             jnp.where(w2, flip * jnp.sign(d[2]), 0.0))
        return (jnp.where(ok, t, bt), vwhere(ok, n, bn),
                jnp.where(ok, mt, bm), jnp.where(ok, meta.ns + j, bi))

    def cylinder_consider(j, o, d, bt, bn, bm, bi):
        """Finite cylinder: rotate-to-axis + slab ∩ infinite cylinder
        (ray.cpp:286-352 physics; matches ops/intersect.cylinder_hit_one
        incl. the fixed cap normals)."""
        bx = consts_ref[meta.CYL + 0, j]
        by = consts_ref[meta.CYL + 1, j]
        bz = consts_ref[meta.CYL + 2, j]
        r = consts_ref[meta.CYL + 3, j]
        h = consts_ref[meta.CYL + 4, j]
        rr_ = [consts_ref[meta.CYL + 5 + k, j] for k in range(9)]
        mt = consts_ref[meta.CYL + 14, j].astype(jnp.int32)
        rel = (o[0] - bx, o[1] - by, o[2] - bz)
        # local frame: axis -> +Z (rot is world->local, row-major)
        ox = rr_[0] * rel[0] + rr_[1] * rel[1] + rr_[2] * rel[2]
        oy = rr_[3] * rel[0] + rr_[4] * rel[1] + rr_[5] * rel[2]
        oz = rr_[6] * rel[0] + rr_[7] * rel[1] + rr_[8] * rel[2]
        dx = rr_[0] * d[0] + rr_[1] * d[1] + rr_[2] * d[2]
        dy = rr_[3] * d[0] + rr_[4] * d[1] + rr_[5] * d[2]
        dz = rr_[6] * d[0] + rr_[7] * d[1] + rr_[8] * d[2]
        dz_s = jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)
        t_bot = -oz / dz_s
        t_top = (h - oz) / dz_s
        t_slab_min = jnp.minimum(t_bot, t_top)
        t_slab_max = jnp.maximum(t_bot, t_top)
        a = dx * dx + dy * dy
        b = dx * ox + dy * oy
        c = ox * ox + oy * oy - r * r
        disc = b * b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        a_ok = a > 1e-12
        safe_a = jnp.where(a_ok, a, 1.0)
        t_cyl_min = jnp.where(a_ok, (-b - sq) / safe_a, -INF)
        t_cyl_max = jnp.where(a_ok, (-b + sq) / safe_a, INF)
        t_en = jnp.maximum(t_slab_min, t_cyl_min)
        t_ex = jnp.minimum(t_slab_max, t_cyl_max)
        inner = t_en < t_min
        t = jnp.where(inner, t_ex, t_en)
        ok = ((disc >= 0.0) & (t_ex >= jnp.maximum(t_en, t_min))
              & (t >= t_min) & (t < bt))
        cap_win = (inner & (t_slab_max < t_cyl_max)) | (
            (~inner) & (t_slab_min > t_cyl_min))
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        cap_z = jnp.where(pz > 0.5 * h, 1.0, -1.0)
        nlx = jnp.where(cap_win, 0.0, px)
        nly = jnp.where(cap_win, 0.0, py)
        nlz = jnp.where(cap_win, cap_z, 0.0)
        # world normal = rot^T @ local
        n = (rr_[0] * nlx + rr_[3] * nly + rr_[6] * nlz,
             rr_[1] * nlx + rr_[4] * nly + rr_[7] * nlz,
             rr_[2] * nlx + rr_[5] * nly + rr_[8] * nlz)
        return (jnp.where(ok, t, bt), vwhere(ok, n, bn),
                jnp.where(ok, mt, bm),
                jnp.where(ok, meta.ns + meta.nb + j, bi))

    def analytic_closest(o, d):
        bt = f0 + INF
        bn = (f0, f0, f0 + 1.0)
        bm = i0
        bi = i0 - 1
        for j in range(meta.ns):
            bt, bn, bm, bi = sphere_consider(j, o, d, bt, bn, bm, bi)
        for j in range(meta.nb):
            bt, bn, bm, bi = box_consider(j, o, d, bt, bn, bm, bi)
        for j in range(meta.nc):
            bt, bn, bm, bi = cylinder_consider(j, o, d, bt, bn, bm, bi)
        return bt, bn, bm, bi

    def analytic_occluded(o, d, tf):
        occ = f0 > 1.0  # all-false bool plane
        bn = (f0, f0, f0)
        bm = i0
        for j in range(meta.ns):
            t2, _, _, _ = sphere_consider(j, o, d, f0 + INF, bn, bm, i0)
            occ = occ | (t2 < tf)
        for j in range(meta.nb):
            t2, _, _, _ = box_consider(j, o, d, f0 + INF, bn, bm, i0)
            occ = occ | (t2 < tf)
        for j in range(meta.nc):
            t2, _, _, _ = cylinder_consider(j, o, d, f0 + INF, bn, bm, i0)
            occ = occ | (t2 < tf)
        return occ

    iota_L = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    KEY_MASK = 4095          # low bits carry the leaf id (L <= 4096)
    KEY_NONE = jnp.int32(0x7F800000)   # +inf bits: decodes ABOVE any
    #                  finite bound incl. the INF miss-t (3.4e38) — "no leaf"
    LR = L // LANE           # kf rows: keys live LANE-MAJOR (LR, 128)
    M_LEAF = leafmm_ref.shape[0]   # clamp domain for coefficient slices
    LANE_MASK = 127          # low bits of a hit-t encoding carry the lane
    # any encoded hit-t at or above this is the INF miss sentinel: the
    # sentinel is a FINITE float, so its lane-cleared encoding rounds
    # BELOW the sentinel itself and would otherwise fake a "better" hit
    INF_ENC = jnp.int32(
        int(_np.array(INF, _np.float32).view(_np.int32)) & ~LANE_MASK)

    def enc_bound(row):
        """(1,N) nonneg f32 plane -> its max, as ENCODED int32 scalar.

        IEEE ordering == int ordering for nonnegative floats, so key
        comparisons happen entirely in the integer domain (Mosaic has no
        scalar bitcast; the (1,1) vector bitcast folds away)."""
        m = jnp.max(row, keepdims=True)
        return jnp.sum(jax.lax.bitcast_convert_type(m, jnp.int32))

    def row_cull(rox, roy, roz, rdx, rdy, rdz, bound):
        """(1,LANE) ray row vs (L,1) leaf AABB columns -> wanted-leaf key."""
        ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
        a0 = (leaf_ref[:, 0:1] - rox) * ivx
        b0 = (leaf_ref[:, 3:4] - rox) * ivx
        a1 = (leaf_ref[:, 1:2] - roy) * ivy
        b1 = (leaf_ref[:, 4:5] - roy) * ivy
        a2 = (leaf_ref[:, 2:3] - roz) * ivz
        b2 = (leaf_ref[:, 5:6] - roz) * ivz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(a0, b0), jnp.minimum(a1, b1)),
                         jnp.minimum(a2, b2))
        tf_ = jnp.minimum(jnp.minimum(jnp.maximum(a0, b0), jnp.maximum(a1, b1)),
                          jnp.maximum(a2, b2))
        near = jnp.maximum(tn, 0.0)
        wants = (tf_ >= near) & (near < bound)     # (L, LANE)
        # key = entry distance of the nearest wanting lane -> front-to-back
        # visit order (unwanted leaves key to +INF). Occupied leaves only:
        # pad leaves' inverted AABBs do NOT reject under the per-axis
        # min/max slab form (min(+inf,-inf) = -inf) — without the m_occ
        # mask every row sweeps all L - m_occ pads.
        nearr = jnp.min(jnp.where(wants, near, INF), axis=1, keepdims=True)
        # ENCODED keys: distance bits (rounded DOWN, so still a valid
        # lower bound for the ordered-walk termination) with the leaf id
        # in the low 12 bits. One int32 min then yields the next leaf AND
        # its distance — the picks were two (L,1) reductions per leaf and
        # the dominant fixed cost of each walk trip.
        bits = jax.lax.bitcast_convert_type(
            jnp.minimum(nearr, 3e37), jnp.int32)
        enc = (bits & ~KEY_MASK) | iota_L
        return jnp.where((iota_L < m_occ) & (nearr < INF), enc, KEY_NONE)

    def pairs3(rx3, ry3, rz3, tx, ty, tz, cc=None):
        # rx3.. are the walk-hoisted (1, 128, 1) ray components: the
        # lane->sublane broadcast relayout happens ONCE per walk instead
        # of 18x per visit (Mosaic does not hoist it out of the while
        # body when the source is a dynamic-sublane row slice — measured
        # ~7x per-visit cost on chip, r5)
        out = (rx3 * tx[None, None, :] + ry3 * ty[None, None, :]
               + rz3 * tz[None, None, :])
        if cc is not None:
            out = out + cc[None, None, :]
        return out

    def pairs(rx, ry, rz, tx, ty, tz, cc=None):
        out = (rx[:, :, None] * tx[None, None, :]
               + ry[:, :, None] * ty[None, None, :]
               + rz[:, :, None] * tz[None, None, :])
        if cc is not None:
            out = out + cc[None, None, :]
        return out

    def leaf_sweep(leaf, r3, bound):
        """One 128-triangle leaf vs a 128-ray row -> (t (1,128,128), coeff).

        coeff is the leaf's (1, 8, 256) slice of the leaf-major stack:
        rows 0-3 = [s1;c1 | s2;c2] column blocks, rows 4-7 block 0 =
        [n; cw], row 4 block 1 = material ids. ONE leading-axis dynamic
        slice — a tile-aligned base-offset add. (An MXU form — two
        (128,4)@(4,384) dots against a [o,1,d,0] ray matrix — was
        measured SLOWER here: the serial walk pays MXU latency per visit
        with nothing to pipeline against, and f32-HIGHEST is 6 passes.)
        """
        coeff = leafmm_ref[pl.ds(leaf, 1)]         # one (1,8,256) slice
        ox3, oy3, oz3, dx3, dy3, dz3 = r3
        row = lambda k: (coeff[0, k % 4, (k // 4) * LANE:(k // 4 + 1) * LANE]
                         if k < 8 else coeff[0, 4 + (k - 8), 0:LANE])
        s1x, s1y, s1z, c1 = row(0), row(1), row(2), row(3)
        s2x, s2y, s2z, c2 = row(4), row(5), row(6), row(7)
        nx, ny, nz, cw = row(8), row(9), row(10), row(11)
        o_w = pairs3(ox3, oy3, oz3, nx, ny, nz, cw)
        d_w = pairs3(dx3, dy3, dz3, nx, ny, nz)
        o_u = pairs3(ox3, oy3, oz3, s1x, s1y, s1z, c1)
        d_u = pairs3(dx3, dy3, dz3, s1x, s1y, s1z)
        o_v = pairs3(ox3, oy3, oz3, s2x, s2y, s2z, c2)
        d_v = pairs3(dx3, dy3, dz3, s2x, s2y, s2z)
        ok_w = jnp.abs(d_w) > 1e-12
        # approx reciprocal (~2^-12 rel err): the one full-latency ALU op
        # in the sweep; hit-t error is orders below the t_min/hit_eps slack
        if interpret_exact:
            t = -o_w / jnp.where(ok_w, d_w, 1.0)
        else:
            t = -o_w * pl.reciprocal(jnp.where(ok_w, d_w, 1.0), approx=True)
        u = o_u + t * d_u
        v = o_v + t * d_v
        ok = (ok_w & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= t_min) & (t < bound))     # bound is (1, 128, 1)
        return jnp.where(ok, t, INF), coeff

    # The per-leaf visit keys live in VMEM scratch kf, (L/128, 128)
    # LANE-MAJOR (r5: the old (L, 1) sublane-major buffer used 1 of 128
    # lanes and made every per-visit min-reduction a ~68-tile crawl).
    # Leaves are visited FRONT TO BACK (min key first, knocked out to INF
    # after each visit); closest-hit terminates once the nearest remaining
    # leaf lies beyond every lane's current best — the packet analog of
    # the ordered descent the reference's queue walk never had
    # (raycast_bvh, ray.cpp:776-812 pushes children unordered).
    # NOTE on rejected designs (measured on bunny/v5e, round 4): a
    # block-level UNION walk (one while loop per block, 8x-wide sweeps)
    # ran 2.4x slower — the union of 8 rows' leaf sets times 8x-wide
    # sweeps exceeds the per-row work; a LOCKSTEP walk (8 rows advancing
    # together for pipelining) ran 1.7x slower — rows finish at different
    # depths and the stragglers waste whole-trip sweeps; a conservative
    # FRUSTUM (interval-arithmetic) cull in place of the exact per-lane
    # (L, 128) cull ran 4.4x slower — visit count, not cull flops, is
    # what the walk's cost follows, and the exact cull minimizes it.

    def _knock(leaf):
        # keys carry their leaf id in the low bits, so the knock-out is a
        # value match — a dense (LR, 128) select, no positional indexing.
        # (KEY_NONE's low bits alias leaf 0; rewriting KEY_NONE->KEY_NONE
        # is harmless.)
        if kf_lane:
            kf[:, :] = jnp.where((kf[:, :] & KEY_MASK) == leaf,
                                 KEY_NONE, kf[:, :])
        else:
            kf[pl.ds(leaf, 1), :] = jnp.full((1, 1), KEY_NONE, jnp.int32)

    def _store_keys(keys_col):
        if ablate == "nokeys":
            kf[:, :] = jnp.full(kf.shape, KEY_NONE, jnp.int32)
            return
        kf[:, :] = keys_col.reshape(LR, LANE) if kf_lane else keys_col
        if ablate == "nowalk":
            kf[:, :] = jnp.full(kf.shape, KEY_NONE, jnp.int32)

    lane_iota3 = jax.lax.broadcasted_iota(jnp.int32, (1, LANE, LANE), 2)

    def tri_closest_rows():
        def row_fn(r, _):
            rox = st[0, pl.ds(r, 1), :]
            roy = st[1, pl.ds(r, 1), :]
            roz = st[2, pl.ds(r, 1), :]
            rdx = st[3, pl.ds(r, 1), :]
            rdy = st[4, pl.ds(r, 1), :]
            rdz = st[5, pl.ds(r, 1), :]
            bt0 = hv[0, pl.ds(r, 1), :]

            # all-dead rows (compaction tails) skip cull + walk entirely
            @pl.when(jnp.max(bt0) > 0.0)
            def _():
                _store_keys(row_cull(rox, roy, roz, rdx, rdy, rdz, bt0))
                r3 = tuple(x[:, :, None] for x in
                           (rox, roy, roz, rdx, rdy, rdz))

                def cond(c):
                    mn, it, bt = c[0], c[1], c[2]
                    return (mn & ~KEY_MASK) < enc_bound(bt)

                # The walk carry lives in the sweep's NATIVE (1, 128, 1)
                # ray-on-sublane layout: every reduction keeps dims and
                # every compare/select broadcasts in place, so a visit
                # does NO lane<->sublane relayouts (the old (1, 128)
                # lane-major carry forced one per reduction/compare —
                # measured ~2 us/visit of relayout stalls on chip, r5).
                def visit(leaf, guard, bt, bnx, bny, bnz, bm, bid):
                    bound = jnp.where(guard, bt, 0.0)
                    t, coeff = leaf_sweep(leaf, r3, bound)
                    # winner attrs: normals = rows 4-6 block 0,
                    # material ids = row 4 block 1
                    nrow = lambda j: coeff[0, 4 + j, 0:LANE][None, None, :]
                    mrow = coeff[0, 4, LANE:][None, None, :]
                    if extract_enc:
                        enc = (jax.lax.bitcast_convert_type(t, jnp.int32)
                               & ~LANE_MASK) | lane_iota3
                        m = jnp.min(enc, -1, keepdims=True)   # (1,128,1)
                        win_t = jax.lax.bitcast_convert_type(
                            m & ~LANE_MASK, jnp.float32)
                        better = (m < INF_ENC) & (win_t < bt)
                        lane_w = m & LANE_MASK
                        msk = better & (lane_iota3 == lane_w)
                        nxv = jnp.sum(jnp.where(msk, nrow(0), 0.0), -1,
                                      keepdims=True)
                        nyv = jnp.sum(jnp.where(msk, nrow(1), 0.0), -1,
                                      keepdims=True)
                        nzv = jnp.sum(jnp.where(msk, nrow(2), 0.0), -1,
                                      keepdims=True)
                        mv = jnp.sum(jnp.where(msk, mrow, 0.0), -1,
                                     keepdims=True)
                        # hit record: slot id = tri_base + leaf*128 + lane
                        idv = meta.tri_base + leaf * LANE + lane_w
                        return (jnp.where(better, win_t, bt),
                                jnp.where(better, nxv, bnx),
                                jnp.where(better, nyv, bny),
                                jnp.where(better, nzv, bnz),
                                jnp.where(better, mv, bm),
                                jnp.where(better, idv, bid))

                    # HYBRID (default): encoded winner detection every
                    # visit (one min-reduction gives distance AND lane —
                    # no second argmin sweep), attrs cond-gated so the
                    # many no-improvement visits skip the 4 masked
                    # reductions entirely.
                    enc = (jax.lax.bitcast_convert_type(t, jnp.int32)
                           & ~LANE_MASK) | lane_iota3
                    m = jnp.min(enc, -1, keepdims=True)       # (1,128,1)
                    win_t = jax.lax.bitcast_convert_type(
                        m & ~LANE_MASK, jnp.float32)
                    better = (m < INF_ENC) & (win_t < bt)
                    if ablate == "noattr":
                        return (jnp.where(win_t < -1.0, win_t, bt), bnx,
                                bny, bnz, bm, bid)

                    def with_attrs(_):
                        lane_w = m & LANE_MASK
                        msk = better & (lane_iota3 == lane_w)
                        nxv = jnp.sum(jnp.where(msk, nrow(0), 0.0), -1,
                                      keepdims=True)
                        nyv = jnp.sum(jnp.where(msk, nrow(1), 0.0), -1,
                                      keepdims=True)
                        nzv = jnp.sum(jnp.where(msk, nrow(2), 0.0), -1,
                                      keepdims=True)
                        mv = jnp.sum(jnp.where(msk, mrow, 0.0), -1,
                                     keepdims=True)
                        idv = meta.tri_base + leaf * LANE + lane_w
                        return (jnp.where(better, win_t, bt),
                                jnp.where(better, nxv, bnx),
                                jnp.where(better, nyv, bny),
                                jnp.where(better, nzv, bnz),
                                jnp.where(better, mv, bm),
                                jnp.where(better, idv, bid))

                    return jax.lax.cond(
                        jnp.any(better), with_attrs,
                        lambda _: (bt, bnx, bny, bnz, bm, bid), None)

                def body(c):
                    # visit SEVERAL leaves per trip: the while handshake
                    # and the key reductions are a fixed cost per trip,
                    # amortized over trip_leaves front-to-back visits
                    mn, it, bt, bnx, bny, bnz, bm, bid = c
                    cur = mn
                    for k in range(trip_leaves):
                        if k > 0:
                            cur = jnp.min(kf[:, :])
                        leaf = jnp.minimum(cur & KEY_MASK, M_LEAF - 1)
                        guard = True if k == 0 else (
                            (cur & ~KEY_MASK) < enc_bound(bt))
                        _knock(leaf)
                        bt, bnx, bny, bnz, bm, bid = visit(
                            leaf, guard, bt, bnx, bny, bnz, bm, bid)
                    return (jnp.min(kf[:, :]), it + float(trip_leaves),
                            bt, bnx, bny, bnz, bm, bid)

                init = (jnp.min(kf[:, :]), jnp.float32(0.0),
                        bt0[:, :, None],
                        hv[1, pl.ds(r, 1), :][:, :, None],
                        hv[2, pl.ds(r, 1), :][:, :, None],
                        hv[3, pl.ds(r, 1), :][:, :, None],
                        hm[pl.ds(r, 1), :].astype(jnp.float32)[:, :, None],
                        hi[pl.ds(r, 1), :][:, :, None])
                _, it, bt, bnx, bny, bnz, bm, bid = jax.lax.while_loop(
                    cond, body, init)
                if debug_counters:   # CPU-interpret profiling only: the
                    # SMEM accumulation stalls the Mosaic compile on TPUs
                    cnt_ref[0, 0, 0] += it
                hv[0, pl.ds(r, 1), :] = bt[:, :, 0]
                hv[1, pl.ds(r, 1), :] = bnx[:, :, 0]
                hv[2, pl.ds(r, 1), :] = bny[:, :, 0]
                hv[3, pl.ds(r, 1), :] = bnz[:, :, 0]
                hm[pl.ds(r, 1), :] = bm[:, :, 0].astype(jnp.int32)
                hi[pl.ds(r, 1), :] = bid[:, :, 0]
            return 0

        jax.lax.fori_loop(0, SUB, row_fn, 0)

    def tri_shadow_rows():
        def row_fn(r, _):
            rox = sh[0, pl.ds(r, 1), :]
            roy = sh[1, pl.ds(r, 1), :]
            roz = sh[2, pl.ds(r, 1), :]
            rdx = sh[3, pl.ds(r, 1), :]
            rdy = sh[4, pl.ds(r, 1), :]
            rdz = sh[5, pl.ds(r, 1), :]
            tfb0 = sh[6, pl.ds(r, 1), :]
            occ0 = sh[7, pl.ds(r, 1), :]
            tfb = jnp.where(occ0 > 0.5, 0.0, tfb0)

            @pl.when(jnp.max(tfb) > 0.0)
            def _():
                _store_keys(row_cull(rox, roy, roz, rdx, rdy, rdz, tfb))
                r3 = tuple(x[:, :, None] for x in
                           (rox, roy, roz, rdx, rdy, rdz))

                tfb_s = tfb[:, :, None]          # (1, 128, 1) sublane form

                def cond(c):
                    mn, it, occ = c
                    # a leaf farther than every unresolved lane's light
                    # distance cannot occlude anything that still matters
                    return (mn & ~KEY_MASK) < enc_bound(
                        jnp.where(occ < 0.5, tfb_s, 0.0))

                def body(c):
                    mn, it, occ = c
                    cur = mn
                    for k in range(trip_leaves):
                        if k > 0:
                            cur = jnp.min(kf[:, :])
                        leaf = jnp.minimum(cur & KEY_MASK, M_LEAF - 1)
                        gate = (occ > 0.5) if k == 0 else (
                            (occ > 0.5) | (cur >= KEY_NONE))
                        _knock(leaf)
                        bound = jnp.where(gate, 0.0, tfb_s)
                        t, _ = leaf_sweep(leaf, r3, bound)
                        occ = jnp.maximum(
                            occ, jnp.any(t < INF, -1, keepdims=True)
                            .astype(jnp.float32))
                    return jnp.min(kf[:, :]), it + float(trip_leaves), occ

                _, it, occ = jax.lax.while_loop(
                    cond, body, (jnp.min(kf[:, :]), jnp.float32(0.0),
                                 occ0[:, :, None]))
                if debug_counters:
                    cnt_ref[0, 0, 1] += it
                sh[7, pl.ds(r, 1), :] = occ[:, :, 0]
            return 0

        jax.lax.fori_loop(0, SUB, row_fn, 0)

    def gather_mat(mi):
        acc = {}
        for name, off, width in (("kd", 0, 3), ("ks", 3, 3), ("kt", 6, 3),
                                 ("ior", 9, 1), ("emit", 10, 3),
                                 ("isl", 13, 1), ("tol", 14, 1),
                                 ("rough", 15, 1), ("pd_c", 16, 1),
                                 ("ps_c", 17, 1)):
            acc[name] = [f0] * width if width > 1 else f0
        for m in range(meta.nm):
            sel = mi == m
            g = lambda off: jnp.where(sel, consts_ref[meta.MAT + off, m], 0.0)
            for name, off, width in (("kd", 0, 3), ("ks", 3, 3), ("kt", 6, 3),
                                     ("emit", 10, 3)):
                acc[name] = [acc[name][k] + g(off + k) for k in range(3)]
            for name, off in (("ior", 9), ("isl", 13), ("tol", 14),
                              ("rough", 15), ("pd_c", 16), ("ps_c", 17)):
                acc[name] = acc[name] + g(off)
        for name in ("kd", "ks", "kt", "emit"):
            acc[name] = tuple(acc[name])
        return acc

    def bounce_body(fb):
        # fb = fused-bounce index (STATIC: the segment loop is a python
        # unroll; named fb — the analytic pass rebinds `bi` locally)
        def u_at(j):
            return u_ref[0, fb * 8 + j, :, :]

        def ls_at(k):
            return ls_ref[0, fb * 10 + k, :, :]

        o = (st[0], st[1], st[2])
        d = (st[3], st[4], st[5])
        tp = (st[6], st[7], st[8])
        rad = (st[9], st[10], st[11])
        prev_pdf = st[12]
        alive = st[13] > 0.5

        # ---- closest hit: analytic (vector) then triangles
        bt, bn, bm, bi = analytic_closest(o, d)
        # dead lanes get bound 0: they can never want a leaf, and the
        # block walk's termination max ignores them
        hv[0] = jnp.where(alive, bt, 0.0)
        hv[1], hv[2], hv[3] = bn[0], bn[1], bn[2]
        hm[:, :] = bm
        hi[:, :] = bi
        if has_tris:
            tri_closest_rows()
        t = hv[0]
        n = vnormalize((hv[1], hv[2], hv[3]), 1e-12)
        mat = hm[:, :]
        valid = t < INF

        # ---- material params of the hit (miss/dead lanes read material 0)
        safe_mat = jnp.where(valid, mat, 0)
        mp = gather_mat(safe_mat)

        # ---- emissive accumulation with MIS (integrator.py bounce)
        hit_light = (mp["isl"] > 0.5) & valid
        if do_nee and do_mis:
            inv_l_hit = f0
            for l in range(meta.nl):
                inv_l_hit = inv_l_hit + jnp.where(
                    mp["tol"] == float(l), consts_ref[meta.LGT + 0, l], 0.0)
            cos_l = vdot(n, vneg(d))
            p_nee = inv_l_hit * t * t / jnp.maximum(jnp.abs(cos_l), 1e-6)
            p_nee = jnp.where(valid, p_nee, 0.0)
            mis_applies = (mp["tol"] >= 0.0) & (prev_pdf >= 0.0)
            mis_w = jnp.where(
                mis_applies,
                prev_pdf / jnp.maximum(prev_pdf + p_nee, 1e-12), 1.0)
        elif do_nee:
            # NEE-only: zero only front-facing emissive bounce hits — the
            # explicit connection never integrates back faces (ADVICE r2;
            # mirrors integrator.py)
            front = vdot(n, vneg(d)) > 1e-6
            mis_w = jnp.where(
                (mp["tol"] >= 0.0) & (prev_pdf >= 0.0) & front, 0.0, 1.0)
        else:
            mis_w = f0 + 1.0
        if ref_rr_quirk and rr_p < 1.0 and (b_start + fb) > rr_start:
            # reference's uncompensated final RR gate (config.py) — only
            # once the producing bounce ran an RR gate (ADVICE r4)
            mis_w = mis_w * jnp.where(prev_pdf >= 0.0, rr_p, 1.0)
        add_emit = alive & hit_light
        rad = tuple(
            rk + jnp.where(add_emit, tk * ek * mis_w, 0.0)
            for rk, tk, ek in zip(rad, tp, mp["emit"]))

        alive = alive & valid & ~hit_light

        # ---- shading point (double-where keeps parked lanes finite)
        t_safe = jnp.where(valid, t, 1.0)
        x = vadd(o, vscale(t_safe - hit_eps, d))
        x = vwhere(alive, x, o)
        wo = vneg(d)
        seg_len = jnp.where(valid, t, 0.0)

        # ---- next-event estimation: the light (point, normal, emit, area
        # pdf) arrives precomputed in ls_ref (any light kind — sphere,
        # cylinder, mesh, box); the kernel adds the geometry coupling and
        # the in-kernel any-hit shadow walk.
        vis_out = f0 + 1.0
        if do_nee:
            lp = (ls_at(0), ls_at(1), ls_at(2))
            ln = (ls_at(3), ls_at(4), ls_at(5))
            lemit = (ls_at(6), ls_at(7), ls_at(8))
            pdf_area = ls_at(9)
            to_l = vsub(lp, x)
            dist = jnp.sqrt(jnp.maximum(vdot(to_l, to_l), 1e-18))
            wi_l = vscale(1.0 / dist, to_l)
            cos_l2 = vdot(ln, vneg(wi_l))
            p_nee_solid = pdf_area * dist * dist / jnp.maximum(
                jnp.abs(cos_l2), 1e-6)
            worth = alive & (cos_l2 > 1e-6)
            xs = vwhere(worth, x, (f0 + PARK, f0 + PARK, f0 + PARK))
            tfb = jnp.where(worth, dist * (1.0 - 1e-3), 0.0)
            occ_a = analytic_occluded(xs, wi_l, tfb)
            sh[0], sh[1], sh[2] = xs
            sh[3], sh[4], sh[5] = wi_l
            sh[6] = tfb
            sh[7] = occ_a.astype(jnp.float32)
            if has_tris:
                tri_shadow_rows()
            visible = sh[7] < 0.5
            vis_out = visible.astype(jnp.float32)
            f_l = eval_bsdf_pl(n, wi_l, wo, mp, seg_len)
            if do_mis:
                p_b = pdf_bsdf_pl(n, wi_l, wo, mp)
                w_l = p_nee_solid / jnp.maximum(p_nee_solid + p_b, 1e-12)
            else:
                w_l = f0 + 1.0
            good = alive & visible & (cos_l2 > 1e-6) & (p_nee_solid > 1e-9)
            # estimator: tp * f * emit * cos/d^2 / pdf_area — the same
            # attached-geometry split as integrator.py
            geom = cos_l2 / jnp.maximum(dist * dist, 1e-12)
            scale = geom * w_l / jnp.maximum(pdf_area, 1e-12)
            rad = tuple(
                rk + jnp.where(good, tk * fk * ek * scale, 0.0)
                for rk, tk, fk, ek in zip(rad, tp, f_l, lemit))

        # ---- Russian roulette (active from global bounce rr_start on;
        # both b_start and bi are static)
        if rr_p < 1.0 and (b_start + fb) >= rr_start:
            u_rr = u_at(4)
            alive = alive & (u_rr < rr_p)
            tp = tuple(tk / rr_p for tk in tp)

        # ---- BSDF continuation
        wi, is_trans = sample_bsdf_pl(u_at(5), u_at(6), u_at(7), n, wo, mp)
        pdf = pdf_bsdf_pl(n, wi, wo, mp)
        f = eval_bsdf_pl(n, wi, wo, mp, seg_len)
        ok_pdf = pdf > 1e-8
        upd = alive & ok_pdf
        inv_pdf = 1.0 / jnp.maximum(pdf, 1e-8)
        tp = tuple(jnp.where(upd, tk * fk * inv_pdf, tk)
                   for tk, fk in zip(tp, f))
        alive = alive & ok_pdf

        x_next = vwhere(is_trans, vadd(o, vscale(t_safe + hit_eps, d)), x)

        parked = (f0 + PARK, f0 + PARK, f0 + PARK)
        o2 = vwhere(alive, x_next, parked)
        d2 = vwhere(alive, wi, d)
        st[0], st[1], st[2] = o2
        st[3], st[4], st[5] = d2
        st[6], st[7], st[8] = tp
        st[9], st[10], st[11] = rad
        st[12] = jnp.where(alive, pdf, -1.0)
        st[13] = alive.astype(jnp.float32)
        # per-bounce records: hit id + NEE visibility for the replay (id
        # exact in f32: slot ids stay far below 2^24) and the alive plane
        # for ray accounting (plane layout: [3+bi] id, [3+nf+bi] vis,
        # [3+2nf+bi] alive)
        rad_ref[0, 3 + fb] = hi[:, :].astype(jnp.float32)
        rad_ref[0, 3 + n_fused + fb] = vis_out
        rad_ref[0, 3 + 2 * n_fused + fb] = alive.astype(jnp.float32)

    # defaults: state copies through, radiance delta zero, every fused
    # bounce's records at miss/dead — a block whose lanes are all dead
    # (compaction tail) does no work at all, and a block that dies
    # mid-segment leaves its remaining bounces at these defaults
    for k in range(11):
        out_ref[0, k] = rays_ref[0, k]
    for k in range(3):
        rad_ref[0, k] = f0
    for b in range(n_fused):
        rad_ref[0, 3 + b] = f0 - 1.0            # miss record
        rad_ref[0, 3 + n_fused + b] = f0        # vis
        rad_ref[0, 3 + 2 * n_fused + b] = f0    # alive count plane
    cnt_ref[0, 0, 0] = 0.0
    cnt_ref[0, 0, 1] = 0.0

    @pl.when(jnp.sum(rays_ref[0, 10]) > 0.0)
    def _():
        for k in range(9):
            st[k] = rays_ref[0, k]
        st[9] = f0                  # radiance delta accumulators
        st[10] = f0
        st[11] = f0
        st[12] = rays_ref[0, 9]     # prev_pdf
        st[13] = rays_ref[0, 10]    # alive

        # ONE kernel launch hosts the whole fused segment: state stays in
        # VMEM across bounces; each fused bounce is predicated on the
        # block still having survivors, so a block that dies mid-segment
        # skips the remaining bounce bodies
        bounce_body(0)
        for fb in range(1, n_fused):
            @pl.when(jnp.sum(st[13]) > 0.0)
            def _(fb=fb):
                bounce_body(fb)
        for k in range(9):
            out_ref[0, k] = st[k]
        out_ref[0, 9] = st[12]
        out_ref[0, 10] = st[13]
        rad_ref[0, 0] = st[9]
        rad_ref[0, 1] = st[10]
        rad_ref[0, 2] = st[11]


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def render_paths_mega(scene, cfg, ro, rd, ps_keys, collect_stats=False,
                      interpret=False, debug_counters=False,
                      collect_records=False):
    """Trace R paths start-to-finish in one fused kernel launch.

    Same contract as integrator.trace_paths: returns radiance (R, 3), or
    (radiance, alive_per_bounce (max_bounces,)) with ``collect_stats``.
    With ``collect_records`` returns (radiance, hit_ids (B, R) int32,
    nee_vis (B, R) f32) — the per-bounce discrete decisions that let
    integrator.trace_paths(replay=...) recompute the same estimate
    differentiably without any traversal (see replay.py). The kernel
    launch itself has no VJP; gradients come from the replay.
    """
    from offline_raytracer_tpu.utils import rng

    import os as _os
    # perf knobs live in RenderConfig (recorded by parity/bench configs);
    # the env vars remain as experiment-time overrides (read at TRACE time:
    # changing them mid-process does not retrace cached jits)
    trip_leaves = int(
        _os.environ.get("MEGA_TRIP_LEAVES", cfg.mega_trip_leaves))
    # r5 A/B on chip (after the sublane-carry rewrite): the branch-free
    # encoded-winner extraction wins — with relayout-free attr
    # reductions, the lax.cond's own any()+scalar-sync+branch overhead
    # exceeds the 4 masked reductions it skips (157.6 vs 179.6 ms
    # whole-sample). "cond" keeps the cond-gated variant for A/B.
    kf_lane = _os.environ.get("MEGA_KF", "lane") == "lane"
    extract_enc = _os.environ.get("MEGA_EXTRACT", "enc") == "enc"
    ablate = _os.environ.get("MEGA_ABLATE", "none")

    R = ro.shape[0]
    B = cfg.max_bounces
    n_blocks = -(-R // BLOCK)
    Rp = n_blocks * BLOCK
    pad = Rp - R
    if pad:
        ro = jnp.concatenate(
            [ro, jnp.full((pad, 3), PARK, ro.dtype)])
        rd = jnp.concatenate(
            [rd, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], rd.dtype), (pad, 1))])

    consts, meta = pack_consts(scene, cfg)
    has_tris = scene.triangles.mat.shape[0] > 0
    if has_tris:
        bvh: TriBVH = scene.tri_bvh
        lb = bvh.leaf_bounds                       # (6, L_lane) rows
        L = lb.shape[1]                            # multiple of LANE
        m_occ = bvh.m_occ
        # leaf-major coefficient stack (M, 8, 256): per leaf, rows 0-3 =
        # the [s1;c1 | s2;c2] column blocks, rows 4-7 block 0 = [n; cw],
        # row 4 block 1 = material ids (exact below 2^24). A visit's
        # coefficient load is ONE tile-aligned leading-axis dynamic
        # slice; the 8x256 shape is the min-footprint tiling for the 13
        # needed (1,128) blocks (8 physical sublanes is the floor).
        M = bvh.planes.shape[1]
        uvpart = (bvh.planes[0:8].reshape(2, 4, M, LANE)
                  .transpose(2, 1, 0, 3).reshape(M, 4, 2 * LANE))
        wpart = jnp.transpose(bvh.planes[8:12], (1, 0, 2))      # (M,4,128)
        matp = bvh.mat.reshape(M, LANE).astype(jnp.float32)
        wm = jnp.concatenate(
            [wpart, jnp.stack(
                [matp, jnp.zeros_like(matp), jnp.zeros_like(matp),
                 jnp.zeros_like(matp)], 1)], 2)                 # (M,4,256)
        leafmm = jnp.concatenate([uvpart, wm], 1)               # (M,8,256)
        leaf_cols = jnp.concatenate(
            [lb.T, jnp.zeros((L, 2), lb.dtype)], 1)  # (L, 8)
    else:
        L = LANE
        m_occ = 0
        leafmm = jnp.zeros((8, 8, 2 * LANE), jnp.float32)
        leaf_cols = jnp.concatenate(
            [jnp.full((L, 3), INF, jnp.float32),
             jnp.full((L, 3), -INF, jnp.float32),
             jnp.zeros((L, 2), jnp.float32)], 1)

    do_nee = cfg.enable_nee and meta.nl > 0

    def light_sample_planes(u8p):
        """(10, Rp) NEE sample planes from the bounce uniforms — the same
        ops/lights.sample_lights draws as integrator.py, any light kind."""
        if not do_nee:
            return jnp.zeros((10, Rp), jnp.float32)
        from offline_raytracer_tpu.ops.lights import sample_lights
        ls = sample_lights(u8p[0:4].T, scene.lights, scene.materials.emit)
        return jnp.concatenate(
            [ls.p.T, ls.normal.T, ls.emit.T, ls.pdf_area[None]], 0)

    tri_off_after = int(_os.environ.get("MEGA_TRI_OFF_AFTER", "99"))

    def seg_call(state, u_all, ls_all, b_start, nf):
        """Run ONE kernel launch hosting bounces [b_start, b_start+nf).

        state: (11, Rp); u_all: (8*nf, Rp); ls_all: (10*nf, Rp) planes
        -> (state', rad (3, Rp), ids (nf, Rp) f32, vis (nf, Rp),
            alive (nf, Rp), dbg). State stays in VMEM across the fused
        bounces; a block whose wavefront dies exits the segment early.
        """
        kernel = functools.partial(
            _mega_kernel, meta=meta, L=L, m_occ=m_occ,
            has_tris=has_tris and b_start < tri_off_after,
            t_min=float(cfg.t_min), hit_eps=float(cfg.hit_eps),
            rr_p=float(cfg.russian_roulette), b_start=b_start,
            rr_start=int(cfg.rr_start_bounce), n_fused=nf,
            do_nee=do_nee, do_mis=do_nee and cfg.enable_mis,
            ref_rr_quirk=cfg.reference_rr_quirk,
            trip_leaves=trip_leaves,
            kf_lane=kf_lane, extract_enc=extract_enc,
            ablate=ablate,
            debug_counters=debug_counters, interpret_exact=interpret)
        full4 = lambda shp: pl.BlockSpec(
            shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM)
        n_rad = 3 + 3 * nf
        st_in = state.reshape(11, n_blocks, SUB, LANE).transpose(1, 0, 2, 3)
        u_in = u_all.reshape(8 * nf, n_blocks, SUB, LANE).transpose(1, 0, 2, 3)
        ls_in = ls_all.reshape(
            10 * nf, n_blocks, SUB, LANE).transpose(1, 0, 2, 3)
        out, rad, cnt = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, 11, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8 * nf, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 10 * nf, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                full4(leafmm.shape),
                full4(leaf_cols.shape),
                pl.BlockSpec(consts.shape, lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 11, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_rad, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, 11, SUB, LANE), jnp.float32),
                jax.ShapeDtypeStruct(
                    (n_blocks, n_rad, SUB, LANE), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks, 1, 2), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((14, SUB, LANE), jnp.float32),
                pltpu.VMEM((4, SUB, LANE), jnp.float32),
                pltpu.VMEM((SUB, LANE), jnp.int32),
                pltpu.VMEM((SUB, LANE), jnp.int32),
                pltpu.VMEM((8, SUB, LANE), jnp.float32),
                pltpu.VMEM((L // LANE, LANE) if kf_lane else (L, 1),
                           jnp.int32),
            ],
            interpret=interpret,
        )(st_in, u_in, ls_in, leafmm, leaf_cols, consts)
        radp = rad.transpose(1, 0, 2, 3).reshape(n_rad, Rp)
        return (out.transpose(1, 0, 2, 3).reshape(11, Rp),
                radp[0:3], radp[3:3 + nf], radp[3 + nf:3 + 2 * nf],
                radp[3 + 2 * nf:], cnt[:, 0, :].sum(0))

    # world AABB (from the leaf bounds; pads are inverted so min/max skip
    # them) for the compaction key's origin cells
    wmin = [jnp.min(leaf_cols[:, k]) for k in range(3)]
    wmax = [jnp.max(leaf_cols[:, 3 + k]) for k in range(3)]

    def coherence_key(state):
        """(dead, direction octant, 3-bit/axis origin Morton cell) int32.

        One stable argsort of this key both compacts dead lanes to the
        tail AND groups survivors into direction-coherent, spatially tight
        128-lane rows — the decisive factor for the per-row leaf-union
        sweep cost (measured ~2x on scattered bounce wavefronts).
        """
        o = state[0:3]
        d = state[3:6]
        dead = state[10] <= 0.5
        octant = ((d[0] > 0).astype(jnp.int32) * 4
                  + (d[1] > 0).astype(jnp.int32) * 2
                  + (d[2] > 0).astype(jnp.int32))
        qs = []
        for k in range(3):
            ext = jnp.maximum(wmax[k] - wmin[k], 1e-6)
            q = jnp.clip((o[k] - wmin[k]) / ext * 32.0, 0.0, 31.0)
            qs.append(q.astype(jnp.int32))
        # 5-bit/axis Morton interleave: spatially compact runs at every
        # scale (plain concatenation groups long thin slabs instead)
        cell = jnp.zeros_like(qs[0])
        for bit in range(5):
            for k in range(3):
                cell = cell * 2 + ((qs[k] >> (4 - bit)) & 1)
        # octant-major beats cell-major grouping (33.9 vs 37.1 ms on the
        # bunny wavefronts, r4 A/B): direction agreement is what keeps a
        # row's front-to-back walk short
        return (dead.astype(jnp.int32) * (1 << 19)
                + octant * (1 << 16) + cell)

    # ---- host bounce loop with wavefront compaction -----------------------
    # After each bounce the wavefront is re-sorted by coherence_key: dead
    # lanes sink to all-dead tail blocks (which cost nothing in the
    # kernel) and survivors pack into direction/position-coherent rows.
    # Radiance/keys/identity ride along in permuted space; one scatter at
    # the end restores ray order. This is the stream compaction the
    # reference never needed (its rays are sequential, ray.cpp:1280) and
    # rounds 1-2 approximated with per-traversal global argsorts.
    alive0 = jnp.concatenate(
        [jnp.ones((R,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
    state = jnp.concatenate([
        ro.T, rd.T, jnp.ones((3, Rp), jnp.float32),
        jnp.full((1, Rp), -1.0, jnp.float32), alive0[None]], 0)
    rad_acc = jnp.zeros((3, Rp), jnp.float32)
    # inverse of the cumulative compaction permutation, maintained
    # incrementally: inv[i] = current position of original ray i. Updated
    # per sort with one unique-index scatter (~0.04 ms) + one gather —
    # replacing the jnp.argsort(idx) inversions that cost ~3 ms EACH on a
    # 262k wavefront (r5 grad decomposition: with records on, those
    # argsorts were 13 ms of the 80 ms step)
    inv = jnp.arange(Rp, dtype=jnp.int32)
    keys_cur = ps_keys
    if pad:
        # tile modulo R: any pad width works even when pad > R (small or
        # tail blocks — ADVICE r3 #1)
        reps = jnp.arange(pad, dtype=jnp.int32) % R
        keys_cur = jnp.concatenate([keys_cur, keys_cur[reps]])
    counts = []
    recs_id = []
    recs_vis = []
    dbg = jnp.zeros((2,), jnp.float32)

    # coherence re-sorts pay off only while the wavefront is large: after
    # bounce ~3 the population is a few % and the 262k-element argsort +
    # gathers (~4 ms on a v5e) dwarf the sweep work they save
    sort_after = min(B - 1, int(
        _os.environ.get("MEGA_SORT_AFTER", cfg.mega_sort_after)))
    # segment plan: single-bounce launches while compaction sorts still
    # run between bounces, then ONE launch fuses the whole tail — the
    # per-bounce launch + state-IO + glue cost for the thin late
    # wavefront collapses into in-VMEM iteration with early block exit
    fuse_tail = _os.environ.get("MEGA_FUSE_TAIL", "1") == "1"
    segs = []
    b = 0
    while b < B:
        nf = 1 if (b < sort_after or not fuse_tail) else B - b
        segs.append((b, nf))
        b += nf
    for b, nf in segs:
        u_all = jnp.concatenate(
            [rng.tagged_uniform_planes(keys_cur, b + i, 8)
             for i in range(nf)], 0)
        ls_all = jnp.concatenate(
            [light_sample_planes(u_all[8 * i:8 * i + 8])
             for i in range(nf)], 0)
        state, rad_delta, ids_p, vis_p, alive_p, d2 = seg_call(
            state, u_all, ls_all, b, nf)
        rad_acc = rad_acc + rad_delta
        if collect_records:
            # restore original ray order through the current perm
            # (constant within a segment: sorts only run between) as a
            # GATHER by the maintained inverse permutation — a TPU
            # scatter of the same data costs ~6 ms per op (r5:
            # per-bounce scatters were ~50 ms of the gradient step's
            # forward pass), and re-deriving the inverse via argsort
            # cost ~3 ms per segment
            recs_id.append(ids_p.astype(jnp.int32)[:, inv[:R]])
            recs_vis.append(vis_p[:, inv[:R]])
        dbg = dbg + d2
        for i in range(nf):
            counts.append(jnp.sum(alive_p[i]))
        if b + nf - 1 < sort_after:
            perm = jnp.argsort(coherence_key(state), stable=True)
            state = state[:, perm]
            rad_acc = rad_acc[:, perm]
            keys_cur = keys_cur[perm]
            # fold this sort into the running inverse: inv' = perm⁻¹∘inv,
            # with perm⁻¹ realized as a unique-index scatter of iota
            p_inv = jnp.zeros((Rp,), jnp.int32).at[perm].set(
                jnp.arange(Rp, dtype=jnp.int32), unique_indices=True)
            inv = p_inv[inv]

    radiance = rad_acc.T[inv[:R]]   # gather beats scatter
    if collect_records:
        return (radiance, jnp.concatenate(recs_id, 0),
                jnp.concatenate(recs_vis, 0))
    if debug_counters:
        return radiance, jnp.concatenate([jnp.stack(counts), dbg])
    if collect_stats:
        return radiance, jnp.stack(counts)
    return radiance
