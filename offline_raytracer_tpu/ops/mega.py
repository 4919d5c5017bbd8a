"""Fused wavefront megakernel: the whole bounce loop in ONE Pallas kernel.

The reference's hot loop is a single function — per ray: traverse, shade,
sample, repeat (tiled_raytrace_bvh, ray.cpp:1178-1466). Rounds 1-2 ran
only *traversal* on-chip; per bounce the full SoA wavefront round-tripped
HBM through XLA for ray sorting, hit refinement, BSDF, NEE and RNG. This
module is the TPU answer at the same altitude as the reference: one
pallas_call whose grid walks (SUB, 128)-ray blocks, and for each block the
ENTIRE path trace — every bounce — runs with ray state resident in VMEM:

- analytic primitives (spheres, boxes): dense branch-free plane math,
  prim parameters read as SMEM scalars (ray.cpp:132-283 physics);
- triangles: per-128-ray-row leaf cull against the packed LBVH's leaf
  AABBs (leaves on the sublane axis) + the affine-barycentric 128-tri
  sweep of ops/bvh.py, with winner normal/material gathered in-sweep by
  masked lane reduction — no refine pass, no gathers, no ray sorts;
- emissive accumulation with MIS, NEE against sphere lights with an
  in-kernel any-hit shadow traversal, Russian roulette, and the 3-lobe
  BSDF (ops/bsdf.py physics) — all as (SUB, 128) vector-plane ops;
- per-bounce uniforms are precomputed OUTSIDE with the exact threefry
  draws of the jnp integrator (utils/rng.bounce_uniforms), so results are
  sharding-invariant and directly comparable against integrator.py.

Scenes it cannot host (cylinder prims, cylinder/mesh lights, BVH beyond
VMEM) fall back to the cull/packet paths (ops/traverse.py dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from offline_raytracer_tpu.ops.bvh import TriBVH

INF = 3.4e38
BIGI = 1 << 30
LANE = 128
SUB = 8
BLOCK = SUB * LANE
PI = 3.14159265358979

PARK = 1e8  # parked-lane origin (integrator.PARK_ORIGIN)

# consts row layout (built by pack_consts; offsets in MegaMeta)
N_SPH_ROWS = 5    # cx cy cz r mat
N_BOX_ROWS = 7    # x0 y0 z0 x1 y1 z1 mat
N_MAT_ROWS = 18   # kd3 ks3 kt3 ior emit3 is_light to_light rough pd_c ps_c
N_LGT_ROWS = 9    # cx cy cz r inv_areaL emit3 pad


class MegaMeta:
    """Static (trace-time) layout info for the consts array."""

    def __init__(self, ns, nb, nm, nl):
        self.ns, self.nb, self.nm, self.nl = ns, nb, nm, nl
        self.SPH = 0
        self.BOX = self.SPH + N_SPH_ROWS
        self.MAT = self.BOX + N_BOX_ROWS
        self.LGT = self.MAT + N_MAT_ROWS
        self.rows = self.LGT + N_LGT_ROWS


def mega_ok(scene, cfg) -> bool:
    """Can the megakernel host this scene?  Static-shape checks only."""
    from offline_raytracer_tpu.ops import traverse_cull as tc

    if scene.cylinders.radius.shape[0] > 0:
        return False
    if scene.materials.ior.shape[0] > LANE:
        return False
    if scene.spheres.radius.shape[0] > LANE or scene.boxes.mat.shape[0] > LANE:
        return False
    lights = scene.lights
    if lights.kind.shape[0] > LANE or lights.em_cdf.shape[0] > 0:
        return False  # mesh/box lights: not yet in-kernel
    # with cylinders gated out and mesh lights gated out, every remaining
    # light table entry is a sphere (scene/build.py registration rules)
    bvh = scene.tri_bvh
    if scene.triangles.mat.shape[0] > 0:
        if bvh is None or not (tc.cull_ok(bvh) and tc.fits_vmem(bvh)):
            return False
    return True


def _row(x, fill=0.0):
    x = jnp.asarray(x, jnp.float32).reshape(-1)
    return jnp.pad(x, (0, LANE - x.shape[0]), constant_values=fill)


def pack_consts(scene, cfg):
    """Scene tables -> ((rows, 128) f32 consts, MegaMeta). jnp-traceable."""
    sph, box, mats, lights = (
        scene.spheres, scene.boxes, scene.materials, scene.lights)
    ns = sph.radius.shape[0]
    nb = box.mat.shape[0]
    nm = mats.ior.shape[0]
    nl = lights.kind.shape[0]
    meta = MegaMeta(ns, nb, nm, nl)

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
    # lights (sphere kind only — enforced by mega_ok + pack-time assert)
    if nl:
        inv_area_l = 1.0 / (jnp.maximum(lights.area, 1e-12) * nl)
        rows += [_row(lights.p0[:, 0]), _row(lights.p0[:, 1]),
                 _row(lights.p0[:, 2]), _row(lights.radius, 1.0),
                 _row(inv_area_l),
                 _row(mats.emit[lights.mat, 0]),
                 _row(mats.emit[lights.mat, 1]),
                 _row(mats.emit[lights.mat, 2]), _row(jnp.zeros(1))]
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
    has_spec = (ks2 > 0.0) & (wi_dot_h > 0.0) & same_side
    es = tuple(jnp.where(has_spec, f * spec_scale, 0.0) for f in f_spec)

    eta_wo, eta_wi = _etas(n_dot_wo, mp["ior"])
    ht = vneg(vadd(vscale(eta_wo, wo), vscale(eta_wi, wi)))
    m = vnormalize(ht)
    m = vscale(jnp.sign(vdot(m, n)), m)
    wo_dot_m = vdot(wo, m)
    wi_dot_m = vdot(wi, m)
    eta = eta_wo / eta_wi
    radicand = 1.0 - eta * eta * (1.0 - wo_dot_m * wo_dot_m)

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
    es_tir_on = same_side & (wi_dot_h > 0.0)
    es_tir = tuple(jnp.where(es_tir_on, f * spec_scale, 0.0) for f in f_spec)
    tir = radicand < 0.0
    kt2 = vdot(mp["kt"], mp["kt"])
    has_trans = kt2 > 0.0
    et = tuple(
        jnp.where(has_trans, a * jnp.where(tir, ei, er), 0.0)
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
    radicand = 1.0 - eta * eta * (1.0 - wo_dot_m * wo_dot_m)
    d_t = _ggx_d(vdot(n, m), mp["rough"])
    jac_denom = jnp.maximum((eta_wo * wo_dot_m + eta_wi * wi_dot_m) ** 2, 1e-9)
    pt_refract = (d_t * jnp.abs(vdot(n, m)) * eta_wi * eta_wi
                  * jnp.abs(wi_dot_m) / jac_denom)
    pt_refract = jnp.where(same_side, 0.0, pt_refract)
    pt = jnp.where(radicand < 0.0, ps, pt_refract)
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
    wi_refract = vsub(
        vscale(eta * wo_dot_m - jnp.sign(n_dot_wo) * sq, m), vscale(eta, wo))
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
    rays_ref, u_ref, planes_ref, matp_ref, leaf_ref, consts_ref,
    out_ref, rad_ref, cnt_ref,
    st, hv, hm, sh, kf,
    *, meta: MegaMeta, L: int, m_occ: int, has_tris: bool,
    t_min: float, hit_eps: float,
    rr_p: float, rr_on: bool, do_nee: bool, do_mis: bool,
    debug_counters: bool = False, interpret_exact: bool = False,
):
    """ONE bounce for one (SUB, 128)-ray block.

    State planes in/out: [0:3] origin, [3:6] direction, [6:9] throughput,
    [9] prev_pdf, [10] alive. rad_ref gets this bounce's radiance DELTA.
    The host wrapper loops bounces with wavefront compaction in between
    (dead lanes partitioned to tail blocks, which skip everything here).
    """
    f0 = jnp.zeros((SUB, LANE), jnp.float32)
    i0 = jnp.zeros((SUB, LANE), jnp.int32)

    def sphere_consider(j, o, d, bt, bn, bm):
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
                jnp.where(ok, mt, bm))

    def box_consider(j, o, d, bt, bn, bm):
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
                jnp.where(ok, mt, bm))

    def analytic_closest(o, d):
        bt = f0 + INF
        bn = (f0, f0, f0 + 1.0)
        bm = i0
        for j in range(meta.ns):
            bt, bn, bm = sphere_consider(j, o, d, bt, bn, bm)
        for j in range(meta.nb):
            bt, bn, bm = box_consider(j, o, d, bt, bn, bm)
        return bt, bn, bm

    def analytic_occluded(o, d, tf):
        occ = f0 > 1.0  # all-false bool plane
        bt = f0 + INF
        bn = (f0, f0, f0)
        bm = i0
        for j in range(meta.ns):
            t2, _, _ = sphere_consider(j, o, d, f0 + INF, bn, bm)
            occ = occ | (t2 < tf)
        for j in range(meta.nb):
            t2, _, _ = box_consider(j, o, d, f0 + INF, bn, bm)
            occ = occ | (t2 < tf)
        del bt
        return occ

    iota_L = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)

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
        return jnp.where(iota_L < m_occ, nearr, INF)

    def pairs(rx, ry, rz, tx, ty, tz, cc=None):
        out = (rx[:, :, None] * tx[None, None, :]
               + ry[:, :, None] * ty[None, None, :]
               + rz[:, :, None] * tz[None, None, :])
        if cc is not None:
            out = out + cc[None, None, :]
        return out

    def leaf_sweep(leaf, rox, roy, roz, rdx, rdy, rdz, bound):
        """One 128-triangle leaf vs a 128-ray row: (tmin, lane-mask, t3d)."""
        coeff = planes_ref[:, pl.ds(leaf, 1), :]   # one (12,1,128) slice
        row = lambda k: coeff[k, 0, :]
        s1x, s1y, s1z, c1 = row(0), row(1), row(2), row(3)
        s2x, s2y, s2z, c2 = row(4), row(5), row(6), row(7)
        nx, ny, nz, cw = row(8), row(9), row(10), row(11)
        o_w = pairs(rox, roy, roz, nx, ny, nz, cw)
        d_w = pairs(rdx, rdy, rdz, nx, ny, nz)
        ok_w = jnp.abs(d_w) > 1e-12
        # approx reciprocal (~2^-12 rel err): the one full-latency ALU op
        # in the sweep; hit-t error is orders below the t_min/hit_eps slack
        if interpret_exact:
            t = -o_w / jnp.where(ok_w, d_w, 1.0)
        else:
            t = -o_w * pl.reciprocal(jnp.where(ok_w, d_w, 1.0), approx=True)
        u = (pairs(rox, roy, roz, s1x, s1y, s1z, c1)
             + t * pairs(rdx, rdy, rdz, s1x, s1y, s1z))
        v = (pairs(rox, roy, roz, s2x, s2y, s2z, c2)
             + t * pairs(rdx, rdy, rdz, s2x, s2y, s2z))
        ok = (ok_w & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= t_min) & (t < bound[:, :, None]))
        return jnp.where(ok, t, INF), coeff

    # The per-leaf near-distance keys live in VMEM scratch (kf) and the
    # while loops carry only scalars + (1, LANE) planes — Mosaic cannot
    # yield the replicated-lane (L, 1) layout through a loop boundary.
    # Leaves are visited FRONT TO BACK (min key first, knocked out to INF
    # after each visit); closest-hit terminates once the nearest remaining
    # leaf lies beyond every lane's current best — the packet analog of
    # the ordered descent the reference's queue walk never had
    # (raycast_bvh, ray.cpp:776-812 pushes children unordered).

    def _pick_leaf(mn):
        return jnp.min(jnp.where(kf[:, :] <= mn, iota_L, BIGI))

    def tri_closest_rows():
        def row_fn(r, _):
            rox = st[0, pl.ds(r, 1), :]
            roy = st[1, pl.ds(r, 1), :]
            roz = st[2, pl.ds(r, 1), :]
            rdx = st[3, pl.ds(r, 1), :]
            rdy = st[4, pl.ds(r, 1), :]
            rdz = st[5, pl.ds(r, 1), :]
            bt0 = hv[0, pl.ds(r, 1), :]
            kf[:, :] = row_cull(rox, roy, roz, rdx, rdy, rdz, bt0)

            def cond(c):
                mn, it, bt = c[0], c[1], c[2]
                return mn < jnp.max(bt)

            def visit(leaf, guard, bt, bnx, bny, bnz, bm):
                bound = jnp.where(guard, bt, 0.0)
                t, coeff = leaf_sweep(
                    leaf, rox, roy, roz, rdx, rdy, rdz, bound)
                tmin = t.min(-1)
                better = tmin < bt

                def with_attrs(_):
                    lane_iota = jax.lax.broadcasted_iota(
                        jnp.int32, t.shape, 2)
                    lane = jnp.min(
                        jnp.where(t <= tmin[:, :, None], lane_iota, BIGI), -1)
                    msk = lane_iota == lane[:, :, None]
                    nrow = lambda k: coeff[k, 0, :][None, None, :]
                    nxv = jnp.sum(jnp.where(msk, nrow(8), 0.0), -1)
                    nyv = jnp.sum(jnp.where(msk, nrow(9), 0.0), -1)
                    nzv = jnp.sum(jnp.where(msk, nrow(10), 0.0), -1)
                    mrow = matp_ref[leaf, :][None, None, :]
                    mv = jnp.sum(jnp.where(msk, mrow, 0), -1)
                    return (jnp.where(better, tmin, bt),
                            jnp.where(better, nxv, bnx),
                            jnp.where(better, nyv, bny),
                            jnp.where(better, nzv, bnz),
                            jnp.where(better, mv, bm))

                return jax.lax.cond(
                    jnp.any(better), with_attrs,
                    lambda _: (bt, bnx, bny, bnz, bm), None)

            def body(c):
                # visit TWO leaves per iteration: the while handshake and
                # the (L,1) key reductions are a large fixed cost per trip
                mn, it, bt, bnx, bny, bnz, bm = c
                leaf_a = _pick_leaf(mn)
                kf[pl.ds(leaf_a, 1), :] = jnp.full((1, 1), INF, jnp.float32)
                mn_b = jnp.min(kf[:, :])
                leaf_b = jnp.minimum(_pick_leaf(mn_b), L - 1)
                kf[pl.ds(leaf_b, 1), :] = jnp.full((1, 1), INF, jnp.float32)

                bt, bnx, bny, bnz, bm = visit(
                    leaf_a, True, bt, bnx, bny, bnz, bm)
                bt, bnx, bny, bnz, bm = visit(
                    leaf_b, mn_b < jnp.max(bt), bt, bnx, bny, bnz, bm)
                return (jnp.min(kf[:, :]), it + 2.0, bt, bnx, bny, bnz, bm)

            init = (jnp.min(kf[:, :]), jnp.float32(0.0), bt0,
                    hv[1, pl.ds(r, 1), :], hv[2, pl.ds(r, 1), :],
                    hv[3, pl.ds(r, 1), :], hm[pl.ds(r, 1), :])
            _, it, bt, bnx, bny, bnz, bm = jax.lax.while_loop(cond, body, init)
            if debug_counters:   # CPU-interpret profiling only: the SMEM
                # accumulation stalls the Mosaic compile on real TPUs
                cnt_ref[0, 0, 0] += it
            hv[0, pl.ds(r, 1), :] = bt
            hv[1, pl.ds(r, 1), :] = bnx
            hv[2, pl.ds(r, 1), :] = bny
            hv[3, pl.ds(r, 1), :] = bnz
            hm[pl.ds(r, 1), :] = bm
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
            tfb = sh[6, pl.ds(r, 1), :]
            occ0 = sh[7, pl.ds(r, 1), :]
            tfb = jnp.where(occ0 > 0.5, 0.0, tfb)
            kf[:, :] = row_cull(rox, roy, roz, rdx, rdy, rdz, tfb)

            def cond(c):
                mn, it, occ = c
                # a leaf farther than every unresolved lane's light distance
                # cannot occlude anything that still matters
                return mn < jnp.max(jnp.where(occ < 0.5, tfb, 0.0))

            def body(c):
                mn, it, occ = c
                leaf_a = _pick_leaf(mn)
                kf[pl.ds(leaf_a, 1), :] = jnp.full((1, 1), INF, jnp.float32)
                mn_b = jnp.min(kf[:, :])
                leaf_b = jnp.minimum(_pick_leaf(mn_b), L - 1)
                kf[pl.ds(leaf_b, 1), :] = jnp.full((1, 1), INF, jnp.float32)

                bound = jnp.where(occ > 0.5, 0.0, tfb)
                t, _ = leaf_sweep(leaf_a, rox, roy, roz, rdx, rdy, rdz, bound)
                occ = jnp.maximum(occ, jnp.any(t < INF, -1).astype(jnp.float32))
                bound = jnp.where(
                    (occ > 0.5) | (mn_b >= INF), 0.0, tfb)
                t, _ = leaf_sweep(leaf_b, rox, roy, roz, rdx, rdy, rdz, bound)
                occ = jnp.maximum(occ, jnp.any(t < INF, -1).astype(jnp.float32))
                return jnp.min(kf[:, :]), it + 2.0, occ

            _, it, occ = jax.lax.while_loop(
                cond, body, (jnp.min(kf[:, :]), jnp.float32(0.0), occ0))
            if debug_counters:
                cnt_ref[0, 0, 1] += it
            sh[7, pl.ds(r, 1), :] = occ
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

    def sample_sphere_lights(up, ua, ub):
        """Uniform light pick + uniform point on the sphere surface
        (ops/lights.py sample_lights, sphere branch)."""
        nl = meta.nl
        lidx = jnp.minimum((up * nl).astype(jnp.int32), nl - 1)
        z = 1.0 - 2.0 * ua
        phi = 2.0 * PI * ub
        s = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
        nsp = (s * jnp.cos(phi), s * jnp.sin(phi), z)
        cx = cy = cz = r = inv_l = e0 = e1 = e2 = f0
        for l in range(nl):
            sel = lidx == l
            gl = lambda off: jnp.where(sel, consts_ref[meta.LGT + off, l], 0.0)
            cx, cy, cz = cx + gl(0), cy + gl(1), cz + gl(2)
            r, inv_l = r + gl(3), inv_l + gl(4)
            e0, e1, e2 = e0 + gl(5), e1 + gl(6), e2 + gl(7)
        p = (cx + r * nsp[0], cy + r * nsp[1], cz + r * nsp[2])
        return p, nsp, (e0, e1, e2), inv_l

    def bounce_body():
        def u_at(j):
            return u_ref[0, j]

        o = (st[0], st[1], st[2])
        d = (st[3], st[4], st[5])
        tp = (st[6], st[7], st[8])
        rad = (st[9], st[10], st[11])
        prev_pdf = st[12]
        alive = st[13] > 0.5

        # ---- closest hit: analytic (vector) then triangles (rows)
        bt, bn, bm = analytic_closest(o, d)
        hv[0], hv[1], hv[2], hv[3] = bt, bn[0], bn[1], bn[2]
        hm[:, :] = bm
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
                    mp["tol"] == float(l), consts_ref[meta.LGT + 4, l], 0.0)
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

        # ---- next-event estimation (sphere lights)
        if do_nee:
            lp, ln, lemit, inv_area = sample_sphere_lights(
                u_at(0), u_at(1), u_at(2))
            to_l = vsub(lp, x)
            dist = jnp.sqrt(jnp.maximum(vdot(to_l, to_l), 1e-18))
            wi_l = vscale(1.0 / dist, to_l)
            cos_l2 = vdot(ln, vneg(wi_l))
            p_nee_solid = inv_area * dist * dist / jnp.maximum(
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
            f_l = eval_bsdf_pl(n, wi_l, wo, mp, seg_len)
            if do_mis:
                p_b = pdf_bsdf_pl(n, wi_l, wo, mp)
                w_l = p_nee_solid / jnp.maximum(p_nee_solid + p_b, 1e-12)
            else:
                w_l = f0 + 1.0
            good = alive & visible & (cos_l2 > 1e-6) & (p_nee_solid > 1e-9)
            # estimator: tp * f * emit * cos/d^2 / pdf_area, with pdf_area
            # = inv_area = 1/(area*L) (the 1/L pick folded in) — the same
            # attached-geometry split as integrator.py
            geom = cos_l2 / jnp.maximum(dist * dist, 1e-12)
            scale = geom * w_l / jnp.maximum(inv_area, 1e-12)
            rad = tuple(
                rk + jnp.where(good, tk * fk * ek * scale, 0.0)
                for rk, tk, fk, ek in zip(rad, tp, f_l, lemit))

        # ---- Russian roulette (rr_on is static: the host loop knows
        # the bounce index)
        if rr_p < 1.0 and rr_on:
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

    # defaults: state copies through and radiance delta is zero — a block
    # whose lanes are all dead (compaction tail) does no work at all
    for k in range(11):
        out_ref[0, k] = rays_ref[0, k]
    for k in range(3):
        rad_ref[0, k] = f0
    if debug_counters:
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
        bounce_body()
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
                      interpret=False, debug_counters=False):
    """Trace R paths start-to-finish in one fused kernel launch.

    Same contract as integrator.trace_paths: returns radiance (R, 3), or
    (radiance, alive_per_bounce (max_bounces,)) with ``collect_stats``.
    Forward-only (no VJP) — gradient renders use the XLA paths.
    """
    from offline_raytracer_tpu.utils import rng

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
        planes = bvh.planes
        matp = bvh.mat.reshape(planes.shape[1], LANE)
        lb = bvh.leaf_bounds                       # (6, L_lane) rows
        L = lb.shape[1]
        m_occ = bvh.m_occ
        leaf_cols = jnp.concatenate(
            [lb.T, jnp.zeros((L, 2), lb.dtype)], 1)  # (L, 8)
    else:
        planes = jnp.zeros((12, 8, LANE), jnp.float32)
        matp = jnp.zeros((8, LANE), jnp.int32)
        L = 8
        m_occ = 0
        leaf_cols = jnp.concatenate(
            [jnp.full((L, 3), INF, jnp.float32),
             jnp.full((L, 3), -INF, jnp.float32),
             jnp.zeros((L, 2), jnp.float32)], 1)

    do_nee = cfg.enable_nee and meta.nl > 0

    def bounce_call(state, u8p, rr_on):
        """state: (11, Rp); u8p: (8, Rp) planes -> (state', rad_delta, dbg)."""
        kernel = functools.partial(
            _mega_kernel, meta=meta, L=L, m_occ=m_occ, has_tris=has_tris,
            t_min=float(cfg.t_min), hit_eps=float(cfg.hit_eps),
            rr_p=float(cfg.russian_roulette), rr_on=rr_on,
            do_nee=do_nee, do_mis=do_nee and cfg.enable_mis,
            debug_counters=debug_counters, interpret_exact=interpret)
        full4 = lambda shp: pl.BlockSpec(
            shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM)
        st_in = state.reshape(11, n_blocks, SUB, LANE).transpose(1, 0, 2, 3)
        u_in = u8p.reshape(8, n_blocks, SUB, LANE).transpose(1, 0, 2, 3)
        out, rad, cnt = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, 11, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                full4(planes.shape),
                full4(matp.shape),
                full4(leaf_cols.shape),
                pl.BlockSpec(consts.shape, lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 11, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, 11, SUB, LANE), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks, 3, SUB, LANE), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks, 1, 2), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((14, SUB, LANE), jnp.float32),
                pltpu.VMEM((4, SUB, LANE), jnp.float32),
                pltpu.VMEM((SUB, LANE), jnp.int32),
                pltpu.VMEM((8, SUB, LANE), jnp.float32),
                pltpu.VMEM((L, 1), jnp.float32),
            ],
            interpret=interpret,
        )(st_in, u_in, planes, matp, leaf_cols, consts)
        return (out.transpose(1, 0, 2, 3).reshape(11, Rp),
                rad.transpose(1, 0, 2, 3).reshape(3, Rp),
                cnt[:, 0, :].sum(0))

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
    idx = jnp.arange(Rp, dtype=jnp.int32)
    keys_cur = ps_keys
    if pad:
        keys_cur = jnp.concatenate([keys_cur, keys_cur[:pad]])
    counts = []
    dbg = jnp.zeros((2,), jnp.float32)

    # coherence re-sorts pay off only while the wavefront is large: after
    # bounce ~3 the population is a few % and the 262k-element argsort +
    # gathers (~8 ms on a v5e) dwarf the sweep work they save
    sort_after = min(B - 1, 3)
    for b in range(B):
        u8p = rng.tagged_uniform_planes(keys_cur, b, 8)
        state, rad_delta, d2 = bounce_call(
            state, u8p, rr_on=b >= cfg.rr_start_bounce)
        rad_acc = rad_acc + rad_delta
        dbg = dbg + d2
        alive = state[10]
        counts.append(jnp.sum(alive))
        if b < sort_after:
            perm = jnp.argsort(coherence_key(state), stable=True)
            state = state[:, perm]
            rad_acc = rad_acc[:, perm]
            idx = idx[perm]
            keys_cur = keys_cur[perm]

    radiance = jnp.zeros((Rp, 3), jnp.float32).at[idx].set(rad_acc.T)[:R]
    if debug_counters:
        return radiance, jnp.concatenate([jnp.stack(counts), dbg])
    if collect_stats:
        return radiance, jnp.stack(counts)
    return radiance
