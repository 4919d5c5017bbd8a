"""Shaped area lights: next-event estimation with MIS.

The reference has a light table (push_light, parser.cpp:1144-1182) whose
sampler only handles spheres and whose explicit-connection branch is dead
code behind ``#if 0`` (sample_random_lights ray.cpp:528-601, NEE block
ray.cpp:1285-1327) — cylinder and mesh lights silently fall through. Here
every emissive shape is NEE-sampleable:

- sphere: uniform over the surface, pdf 1/(4 pi r^2) — the pdf the
  reference *claimed* (ray.cpp:568) while its angle-uniform sampler
  (random.h:100-117) didn't match; ours does;
- cylinder: uniform over lateral surface + both caps;
- triangle mesh: area-proportional triangle pick (per-light CDF +
  searchsorted) then uniform barycentric point;

with the uniform 1/L light pick of the reference. Combined with BSDF
sampling by the balance heuristic. All sampling is per-ray keyed
(counter-based determinism).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from offline_raytracer_tpu.utils.math import normalize

PI = jnp.pi

KIND_SPHERE, KIND_CYLINDER, KIND_MESH = 0, 1, 2


@flax.struct.dataclass
class AreaLights:
    """SoA table of NEE-sampleable emissive shapes (L lights)."""

    kind: jnp.ndarray    # (L,) int32
    mat: jnp.ndarray     # (L,) int32 material (emission lives there)
    area: jnp.ndarray    # (L,) total surface area
    p0: jnp.ndarray      # (L, 3) sphere center / cylinder base
    axis: jnp.ndarray    # (L, 3) cylinder axis (|axis| = height); 0 else
    radius: jnp.ndarray  # (L,) sphere/cylinder radius
    rot: jnp.ndarray     # (L, 3, 3) world<-local for cylinders (identity else)
    tri_lo: jnp.ndarray  # (L,) first row in the emissive-triangle arrays
    tri_hi: jnp.ndarray  # (L,) one-past-last row
    # shared emissive-triangle pool (T rows; empty if no mesh lights)
    em_v0: jnp.ndarray   # (T, 3)
    em_v1: jnp.ndarray
    em_v2: jnp.ndarray
    em_cdf: jnp.ndarray  # (T,) per-light cumulative area, normalized to [0,1]

    @property
    def count(self) -> int:
        return self.kind.shape[0]


def empty_area_lights() -> AreaLights:
    z3 = jnp.zeros((0, 3))
    zi = jnp.zeros((0,), jnp.int32)
    zf = jnp.zeros((0,))
    return AreaLights(
        kind=zi, mat=zi, area=zf, p0=z3, axis=z3, radius=zf,
        rot=jnp.zeros((0, 3, 3)), tri_lo=zi, tri_hi=zi,
        em_v0=z3, em_v1=z3, em_v2=z3, em_cdf=zf)


@flax.struct.dataclass
class LightSample:
    p: jnp.ndarray         # (R, 3) point on the light surface
    normal: jnp.ndarray    # (R, 3) light surface normal (outward)
    emit: jnp.ndarray      # (R, 3) emitted radiance
    pdf_area: jnp.ndarray  # (R,) area-measure pdf incl. the 1/L pick
    mat: jnp.ndarray       # (R,) light material index


def _sample_one(key, lights: AreaLights, emit_table):
    """Sample one (light, point). Scalar path — vmapped by the caller."""
    L = lights.count
    k_pick, k_a, k_b, k_c = jax.random.split(key, 4)
    idx = jax.random.randint(k_pick, (), 0, L)
    u = jax.random.uniform(k_a, ())
    v = jax.random.uniform(k_b, ())
    w = jax.random.uniform(k_c, ())

    kind = lights.kind[idx]
    r = lights.radius[idx]
    p0 = lights.p0[idx]
    axis = lights.axis[idx]
    rot = lights.rot[idx]

    # --- sphere: uniform on surface
    z = 1.0 - 2.0 * u
    phi = 2.0 * PI * v
    s = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    n_sph = jnp.array([1.0, 0.0, 0.0]) * (s * jnp.cos(phi)) + \
        jnp.array([0.0, 1.0, 0.0]) * (s * jnp.sin(phi)) + \
        jnp.array([0.0, 0.0, 1.0]) * z
    p_sph = p0 + r * n_sph

    # --- cylinder: lateral surface vs caps by area fraction (local frame:
    # base at origin, axis = +z, height h; world = rot^T local + base)
    h = jnp.linalg.norm(axis)
    a_lat = 2.0 * PI * r * h
    a_cap = PI * r * r
    a_tot = jnp.maximum(a_lat + 2.0 * a_cap, 1e-12)
    pick_lat = w < a_lat / a_tot
    pick_top = (~pick_lat) & (w < (a_lat + a_cap) / a_tot)
    phi_c = 2.0 * PI * v
    # lateral point
    pl_local = jnp.array([1.0, 0.0, 0.0]) * (r * jnp.cos(phi_c)) + \
        jnp.array([0.0, 1.0, 0.0]) * (r * jnp.sin(phi_c)) + \
        jnp.array([0.0, 0.0, 1.0]) * (u * h)
    nl_local = jnp.array([1.0, 0.0, 0.0]) * jnp.cos(phi_c) + \
        jnp.array([0.0, 1.0, 0.0]) * jnp.sin(phi_c)
    # cap point (top or bottom)
    rr = r * jnp.sqrt(u)
    cap_z = jnp.where(pick_top, h, 0.0)
    cap_nz = jnp.where(pick_top, 1.0, -1.0)
    pc_local = jnp.array([1.0, 0.0, 0.0]) * (rr * jnp.cos(phi_c)) + \
        jnp.array([0.0, 1.0, 0.0]) * (rr * jnp.sin(phi_c)) + \
        jnp.array([0.0, 0.0, 1.0]) * cap_z
    nc_local = jnp.array([0.0, 0.0, 1.0]) * cap_nz
    p_local = jnp.where(pick_lat, pl_local, pc_local)
    n_local = jnp.where(pick_lat, nl_local, nc_local)
    p_cyl = rot.T @ p_local + p0
    n_cyl = rot.T @ n_local

    # --- mesh: CDF-pick a triangle inside [tri_lo, tri_hi), then uniform
    # barycentric (sqrt trick)
    has_mesh = lights.em_cdf.shape[0] > 0
    if has_mesh:
        lo = lights.tri_lo[idx]
        hi = lights.tri_hi[idx]
        # search within this light's normalized CDF slice
        t_rel = jnp.searchsorted(lights.em_cdf, u, side="left")
        t_idx = jnp.clip(t_rel, lo, jnp.maximum(hi - 1, lo)).astype(jnp.int32)
        tv0 = lights.em_v0[t_idx]
        tv1 = lights.em_v1[t_idx]
        tv2 = lights.em_v2[t_idx]
        su = jnp.sqrt(jnp.clip(v, 1e-12, 1.0))
        b0 = 1.0 - su
        b1 = su * (1.0 - w)
        p_mesh = b0 * tv0 + b1 * tv1 + (1.0 - b0 - b1) * tv2
        n_mesh = jnp.cross(tv1 - tv0, tv2 - tv0)
        n_mesh = n_mesh / jnp.maximum(jnp.linalg.norm(n_mesh), 1e-12)
    else:
        p_mesh = jnp.zeros(3)
        n_mesh = jnp.array([0.0, 0.0, 1.0])

    is_sph = kind == KIND_SPHERE
    is_cyl = kind == KIND_CYLINDER
    p = jnp.where(is_sph, p_sph, jnp.where(is_cyl, p_cyl, p_mesh))
    n = jnp.where(is_sph, n_sph, jnp.where(is_cyl, n_cyl, n_mesh))
    pdf_area = 1.0 / (jnp.maximum(lights.area[idx], 1e-12) * L)
    mat = lights.mat[idx]
    return LightSample(p=p, normal=n, emit=emit_table[mat],
                       pdf_area=pdf_area, mat=mat)


def sample_lights(keys, lights: AreaLights, emit_table) -> LightSample:
    """Per-ray light samples from per-ray keys (R,)."""
    return jax.vmap(lambda k: _sample_one(k, lights, emit_table))(keys)


def light_pdf_area(lights: AreaLights, light_idx):
    """Area pdf of sample_lights for a given light index (clipped)."""
    L = lights.count
    i = jnp.clip(light_idx, 0, max(L - 1, 0))
    return 1.0 / (jnp.maximum(lights.area[i], 1e-12) * max(L, 1))


def solid_angle_pdf(pdf_area, dist, cos_light):
    """Convert area pdf to solid-angle pdf at the shading point."""
    return pdf_area * dist**2 / jnp.maximum(jnp.abs(cos_light), 1e-6)


def mis_balance(p_a, p_b):
    """Balance heuristic weight for strategy a vs b."""
    return p_a / jnp.maximum(p_a + p_b, 1e-12)


# ---------------------------------------------------------------------------
# Host-side construction (numpy)
# ---------------------------------------------------------------------------


def build_area_lights(entries, rot_for_axis=None) -> AreaLights:
    """entries: list of dicts with keys
    {kind, mat, p0?, axis?, radius?, rot?, tris? (F,3,3)}. numpy in, pytree out."""
    if not entries:
        return empty_area_lights()
    L = len(entries)
    kind = np.zeros(L, np.int32)
    mat = np.zeros(L, np.int32)
    area = np.zeros(L, np.float32)
    p0 = np.zeros((L, 3), np.float32)
    axis = np.zeros((L, 3), np.float32)
    radius = np.zeros(L, np.float32)
    rot = np.tile(np.eye(3, dtype=np.float32), (L, 1, 1))
    tri_lo = np.zeros(L, np.int32)
    tri_hi = np.zeros(L, np.int32)
    em = []
    cdf_parts = []

    for i, e in enumerate(entries):
        kind[i] = e["kind"]
        mat[i] = e["mat"]
        if e["kind"] == KIND_SPHERE:
            p0[i] = e["p0"]
            radius[i] = e["radius"]
            area[i] = 4.0 * np.pi * e["radius"] ** 2
        elif e["kind"] == KIND_CYLINDER:
            p0[i] = e["p0"]
            axis[i] = e["axis"]
            radius[i] = e["radius"]
            rot[i] = e["rot"]
            h = np.linalg.norm(e["axis"])
            area[i] = 2 * np.pi * e["radius"] * h + 2 * np.pi * e["radius"] ** 2
        else:
            tris = np.asarray(e["tris"], np.float32)  # (F, 3, 3)
            a = 0.5 * np.linalg.norm(
                np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=-1)
            area[i] = a.sum()
            tri_lo[i] = sum(len(x) for x in em and [t for t in em]) if em else 0
            tri_lo[i] = sum(x.shape[0] for x in em)
            tri_hi[i] = tri_lo[i] + tris.shape[0]
            em.append(tris)
            cdf_parts.append(np.cumsum(a) / max(a.sum(), 1e-12))

    if em:
        em_all = np.concatenate(em, 0)
        # global CDF: each light's slice spans [0, 1] independently is NOT
        # monotone globally; offset each slice by its light index so a
        # searchsorted(u) within [lo, hi) works — instead store per-light
        # normalized CDF values and clip the search to the slice (done in
        # _sample_one via jnp.clip).
        cdf_all = np.concatenate(cdf_parts)
        ev0, ev1, ev2 = em_all[:, 0], em_all[:, 1], em_all[:, 2]
    else:
        ev0 = ev1 = ev2 = np.zeros((0, 3), np.float32)
        cdf_all = np.zeros((0,), np.float32)

    return AreaLights(
        kind=jnp.asarray(kind), mat=jnp.asarray(mat), area=jnp.asarray(area),
        p0=jnp.asarray(p0), axis=jnp.asarray(axis), radius=jnp.asarray(radius),
        rot=jnp.asarray(rot), tri_lo=jnp.asarray(tri_lo),
        tri_hi=jnp.asarray(tri_hi), em_v0=jnp.asarray(ev0),
        em_v1=jnp.asarray(ev1), em_v2=jnp.asarray(ev2),
        em_cdf=jnp.asarray(cdf_all))
