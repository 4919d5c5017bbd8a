"""Candidate-leaf statistics for traversal redesign (scratch, not committed)."""
import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np

from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.models.scenes import bunny
from offline_raytracer_tpu.ops.camera import generate_rays
from offline_raytracer_tpu.ops import traverse_pallas as TP
from offline_raytracer_tpu.ops.intersect import refine_hit, TRIANGLE
from offline_raytracer_tpu.utils import rng
from offline_raytracer_tpu.utils.math import normalize

W = H = 512
scene = bunny(width=W, height=H)
bvh = scene.tri_bvh
L = bvh.m_occ
print("leaves:", L, file=sys.stderr)

# leaf AABBs from planes? child_rows has internal AABBs; leaf AABBs = rows
# first_leaf.. of the heap. Recompute from triangle verts via tri_index.
import numpy as onp
planes = onp.asarray(bvh.planes)
tri_index = onp.asarray(bvh.tri_index)
v0 = onp.asarray(scene.triangles.v0); v1 = onp.asarray(scene.triangles.v1); v2 = onp.asarray(scene.triangles.v2)
slots = tri_index[:L*128].reshape(L, 128)
valid = slots >= 0
idx = onp.maximum(slots, 0)
tmin = onp.minimum(onp.minimum(v0[idx], v1[idx]), v2[idx])
tmax = onp.maximum(onp.maximum(v0[idx], v1[idx]), v2[idx])
leaf_min = onp.where(valid[..., None], tmin, onp.inf).min(1)   # (L,3)
leaf_max = onp.where(valid[..., None], tmax, -onp.inf).max(1)

lmin = jnp.asarray(leaf_min); lmax = jnp.asarray(leaf_max)

R = 1 << 16
cfg = RenderConfig(width=W, height=H, spp=32, max_bounces=8, enable_dof=False)
pixel_ids = jnp.arange(R, dtype=jnp.int32)
keys = rng.pixel_sample_keys(rng.render_key(0), pixel_ids, jnp.zeros((R,), jnp.int32))
ro, rd = generate_rays(scene.camera, cfg, pixel_ids, keys)

@jax.jit
def near_ts(ro, rd, best_t):
    inv = 1.0 / rd
    t0 = (lmin[None] - ro[:, None]) * inv[:, None]   # (R, L, 3)
    t1 = (lmax[None] - ro[:, None]) * inv[:, None]
    tn = jnp.minimum(t0, t1).max(-1)
    tf = jnp.maximum(t0, t1).min(-1)
    near = jnp.maximum(tn, 1e-4)
    return jnp.where((tf >= near) & (near < best_t[:, None]), near, jnp.inf)

def stats(label, ro, rd, tclose=None):
    # unbounded candidates
    nt = near_ts(ro, rd, jnp.full((R,), jnp.inf))
    # bounded by true closest hit (upper bound on useful visits w/ perfect pruning)
    t_true, slot = TP.bvh_hit_ts_pallas(bvh, ro, rd, 1e-4)
    ntb = near_ts(ro, rd, jnp.where(jnp.isfinite(t_true), t_true * 1.0001, jnp.inf))
    cand = onp.asarray(jnp.isfinite(nt).sum(-1))
    candb = onp.asarray(jnp.isfinite(ntb).sum(-1))
    first = onp.asarray(jnp.argmin(jnp.where(jnp.isfinite(nt), nt, 1e30), -1))
    wants = onp.asarray(jnp.isfinite(nt))
    wantsb = onp.asarray(jnp.isfinite(ntb))

    def unions(wants, order, B):
        w = wants[order]
        u = [w[i:i+B].any(0).sum() for i in range(0, R, B)]
        return onp.mean(u)

    natural = onp.arange(R)
    byleaf = onp.argsort(first, kind="stable")
    print(f"\n=== {label} ===")
    print(f"candidates/ray: mean {cand.mean():.1f} p50 {onp.median(cand):.0f} p95 {onp.percentile(cand,95):.0f} max {cand.max()}")
    print(f"pruned(t_hit)/ray: mean {candb.mean():.1f} p95 {onp.percentile(candb,95):.0f} max {candb.max()}")
    for B in (256, 1024):
        print(f"block {B}: union natural {unions(wants, natural, B):.0f} | sorted-first-leaf {unions(wants, byleaf, B):.0f} | pruned+sorted {unions(wantsb, byleaf, B):.0f}")
    return t_true, slot

t_true, slot = stats("camera rays", ro, rd)

# bounce rays: cosine hemisphere at camera hits
hit = refine_hit(scene, ro, rd, 1e-4,
                 jnp.full((R,), TRIANGLE, jnp.int32),
                 jnp.where(slot >= 0, bvh.tri_index[jnp.maximum(slot,0)], 0),
                 slot >= 0)
x = ro + (t_true[:, None] - 1e-4) * rd
n = hit.normal
k2 = jax.random.split(jax.random.PRNGKey(7), R)
u = jax.vmap(lambda k: jax.random.uniform(k, (2,)))(k2)
# cosine hemisphere sample around n
a = jnp.where(jnp.abs(n[:, 2:3]) < 0.9, jnp.array([[0.,0.,1.]]), jnp.array([[1.,0.,0.]]))
tang = normalize(jnp.cross(a, n)); bit = jnp.cross(n, tang)
r = jnp.sqrt(u[:, 0]); phi = 2*jnp.pi*u[:, 1]
wi = (r*jnp.cos(phi))[:,None]*tang + (r*jnp.sin(phi))[:,None]*bit + jnp.sqrt(1-u[:,0])[:,None]*n
valid_b = slot >= 0
xo = jnp.where(valid_b[:, None], x, 1e8)
stats("bounce rays (cosine at camera hits)", xo, normalize(wi))
