"""Geometry-sharded rendering: ring-rotate ray blocks over ICI.

The sequence-parallel analog from SURVEY.md §5: when the BVH no longer
fits replicated in per-chip HBM, shard the *triangles* (Morton-contiguous
ranges, one packed LBVH per shard) across the mesh and ring-rotate ray
blocks with `lax.ppermute`, each step intersecting the local geometry
shard and carrying the running (min-t, winner) — the ring-attention
communication pattern applied to rays: blockwise, no materialized
all-to-all, compute overlapping communication.

After `n_devices` steps every ray block is back on its home device
holding the global closest hit. Raw triangle vertices stay replicated for
the differentiable hit refine (they are ~4x smaller than the BVH planes);
materials/lights/camera are tiny and replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.integrator import trace_paths
from offline_raytracer_tpu.ops import intersect as I
from offline_raytracer_tpu.ops.bvh import LEAF, TriBVH, build_tri_bvh
from offline_raytracer_tpu.ops.camera import generate_rays
from offline_raytracer_tpu.ops.traverse import bvh_hit_ts
from offline_raytracer_tpu.parallel.shard import RAY_AXIS, shard_map
from offline_raytracer_tpu.scene.types import Scene
from offline_raytracer_tpu.utils import rng

INF = jnp.inf


def build_bvh_shards(v0, v1, v2, n_shards: int):
    """Split triangles into n_shards Morton-contiguous ranges and build one
    packed LBVH per range, stacked along a leading shard axis.

    Every shard is padded to the same triangle count by DUPLICATING its
    last triangle (a duplicate is harmless: it reports the same hit with
    the same global id), so all shards share (p, m_occ) and stack into
    (S, ...) arrays ready to ride a sharded pytree.

    Returns (child_rows (S, p-1, 128), planes (S, 12, M, 128),
    tri_index (S, M*128) int32 GLOBAL ids, p, m_occ).
    """
    from offline_raytracer_tpu.ops.bvh import morton_codes

    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    n = v0.shape[0]
    assert n > 0
    order = np.argsort(
        morton_codes((v0 + v1 + v2) / 3.0), kind="stable").astype(np.int32)

    per = -(-n // (n_shards * LEAF)) * LEAF     # equal, multiple of LEAF
    child_rows, planes, tri_index = [], [], []
    p = m = None
    for s in range(n_shards):
        ids = order[s * per : (s + 1) * per]
        if ids.size == 0:                        # more shards than leaves
            ids = order[-1:]
        if ids.size < per:                       # duplicate-pad the tail
            ids = np.concatenate([ids, np.full(per - ids.size, ids[-1], np.int32)])
        b = build_tri_bvh(v0[ids], v1[ids], v2[ids], np.zeros(per, np.int32))
        assert p is None or (b.n_leaves == p and b.m_occ == m)
        p, m = b.n_leaves, b.m_occ
        local = np.asarray(b.tri_index)
        glob = np.where(local >= 0, ids[np.clip(local, 0, per - 1)], -1)
        child_rows.append(np.asarray(b.child_rows))
        planes.append(np.asarray(b.planes))
        tri_index.append(glob.astype(np.int32))
    return (jnp.asarray(np.stack(child_rows)), jnp.asarray(np.stack(planes)),
            jnp.asarray(np.stack(tri_index)), p, m)


def _local_bvh(child_rows, planes, tri_index, p, m) -> TriBVH:
    return TriBVH(child_rows=child_rows, planes=planes, tri_index=tri_index,
                  mat=jnp.zeros_like(tri_index), n_leaves=p, m_occ=m)


def _ring_tri_hit(bvh_local: TriBVH, ro, rd, t_min, n_dev: int, axis: str):
    """Closest triangle hit across ALL shards: n_dev ring steps.

    Rays (with their running best) rotate; geometry stays. Returns
    (t (R,), global tri id (R,), -1 = miss) on the rays' home device.
    """
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    R = ro.shape[0]

    def step(carry, _):
        ro_c, rd_c, best_t, best_id = carry
        t, slot = bvh_hit_ts(bvh_local, ro_c, rd_c, t_min)
        gid = jnp.where(slot >= 0, bvh_local.tri_index[jnp.maximum(slot, 0)], -1)
        better = (t < best_t) & (gid >= 0)
        best_t = jnp.where(better, t, best_t)
        best_id = jnp.where(better, gid, best_id)
        carry = jax.lax.ppermute((ro_c, rd_c, best_t, best_id), axis, perm)
        return carry, None

    init = (ro, rd, jnp.full((R,), INF), jnp.full((R,), -1, jnp.int32))
    (ro_b, rd_b, best_t, best_id), _ = jax.lax.scan(
        step, init, None, length=n_dev)
    # after n_dev rotations the block is back home
    return best_t, best_id


def _ring_tri_occluded(bvh_local: TriBVH, ro, rd, t_far, t_min,
                       n_dev: int, axis: str):
    """Any-hit across ALL shards: n_dev ring steps with early lane collapse.

    Each step runs the seeded any-hit traversal against the local shard;
    lanes already occluded rotate with ``t_far`` collapsed to 0, so they are
    dead on launch at every later shard and cost nothing (the distributed
    version of the single-shard shadow fast path, traverse.py).
    """
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(carry, _):
        ro_c, rd_c, tf_c, occ = carry
        _, slot = bvh_hit_ts(bvh_local, ro_c, rd_c, t_min, t_far=tf_c,
                             any_hit=True)
        hit = (slot >= 0) & (
            bvh_local.tri_index[jnp.maximum(slot, 0)] >= 0)
        occ = occ | hit
        tf_c = jnp.where(occ, 0.0, tf_c)        # collapse resolved lanes
        carry = jax.lax.ppermute((ro_c, rd_c, tf_c, occ), axis, perm)
        return carry, None

    init = (ro, rd, t_far, jnp.zeros(ro.shape[:1], bool))
    (_, _, _, occ), _ = jax.lax.scan(step, init, None, length=n_dev)
    return occ


def make_ring_trace_fn(scene: Scene, cfg: RenderConfig,
                       bvh_local: TriBVH, n_dev: int, axis: str = RAY_AXIS):
    """Closest-hit fn for use INSIDE shard_map: local-shard BVH traversal
    merged with replicated analytic primitives, ring-reduced over `axis`."""

    def trace(ro, rd):
        R = ro.shape[0]
        best_t = jnp.full((R,), INF)
        best_type = jnp.zeros((R,), jnp.int32)
        best_idx = jnp.zeros((R,), jnp.int32)

        def consider(t_all, type_id):
            nonlocal best_t, best_type, best_idx
            t_prim = t_all.min(-1)
            i_prim = jnp.argmin(t_all, -1).astype(jnp.int32)
            better = t_prim < best_t
            best_t = jnp.where(better, t_prim, best_t)
            best_type = jnp.where(better, type_id, best_type)
            best_idx = jnp.where(better, i_prim, best_idx)

        if scene.spheres.radius.shape[0]:
            consider(I.sphere_ts(scene.spheres, ro, rd, cfg.t_min), I.SPHERE)
        if scene.boxes.mat.shape[0]:
            consider(I.box_ts(scene.boxes, ro, rd, cfg.t_min), I.BOX)
        if scene.cylinders.radius.shape[0]:
            consider(I.cylinder_ts(scene.cylinders, ro, rd, cfg.t_min), I.CYLINDER)

        tt, tri_id = _ring_tri_hit(bvh_local, ro, rd, cfg.t_min, n_dev, axis)
        better = (tt < best_t) & (tri_id >= 0)
        best_t = jnp.where(better, tt, best_t)
        best_type = jnp.where(better, I.TRIANGLE, best_type)
        best_idx = jnp.where(better, tri_id, best_idx)

        return I.refine_hit(
            scene, ro, rd, cfg.t_min, best_type, best_idx, best_t < INF)

    return trace


def make_ring_occlusion_fn(scene: Scene, cfg: RenderConfig,
                           bvh_local: TriBVH, n_dev: int,
                           axis: str = RAY_AXIS):
    """occluded(ro, rd, t_far) for use INSIDE shard_map: analytic prims
    replicated + triangle any-hit ring (n_dev early-exit steps instead of
    n_dev closest-hit traversals)."""

    def occluded(ro, rd, t_far):
        hit = jnp.zeros(ro.shape[:1], bool)
        if scene.spheres.radius.shape[0]:
            ts = I.sphere_ts(scene.spheres, ro, rd, cfg.t_min)
            hit |= jnp.any(ts < t_far[:, None], -1)
        if scene.boxes.mat.shape[0]:
            ts = I.box_ts(scene.boxes, ro, rd, cfg.t_min)
            hit |= jnp.any(ts < t_far[:, None], -1)
        if scene.cylinders.radius.shape[0]:
            ts = I.cylinder_ts(scene.cylinders, ro, rd, cfg.t_min)
            hit |= jnp.any(ts < t_far[:, None], -1)
        tf = jnp.where(hit, 0.0, t_far)          # resolved lanes ride dead
        return hit | _ring_tri_occluded(
            bvh_local, ro, rd, tf, cfg.t_min, n_dev, axis)

    return occluded


def prepare_ring_shards(scene: Scene, n_dev: int):
    """One-time host-side shard build for the ring path.

    Returns the (child_rows, planes, tri_index, p, m) tuple consumed by
    render_block_ring. Build it ONCE per (scene, mesh) and pass it to every
    render_block_ring call — rebuilding per call costs a full host-side
    LBVH construction per launch (VERDICT r2 weak #7).
    """
    return build_bvh_shards(
        np.asarray(scene.triangles.v0), np.asarray(scene.triangles.v1),
        np.asarray(scene.triangles.v2), n_dev)


def render_block_ring(
    scene: Scene, cfg: RenderConfig, mesh, pixel_ids,
    sample_lo: int = 0, n_samples: int | None = None, shards=None,
):
    """Render with rays AND geometry sharded over the mesh -> (P, 3).

    Per-chip BVH memory is 1/n_devices of the replicated path; each bounce
    costs one full ring rotation over ICI. P must divide by the mesh size.
    ``shards``: the prepare_ring_shards() result; pass it to amortize the
    shard build across calls (built on the fly if omitted).
    """
    n = n_samples if n_samples is not None else cfg.spp
    n_dev = mesh.size
    if shards is None:
        shards = prepare_ring_shards(scene, n_dev)
    child_rows, planes, tri_index, p, m = shards
    scene_rep = scene.replace(tri_bvh=None)     # replicated part only

    def local(scene_rep, cr, pl, ti, ids_shard):
        bvh_local = _local_bvh(cr[0], pl[0], ti[0], p, m)
        trace_fn = make_ring_trace_fn(scene_rep, cfg, bvh_local, n_dev)
        occl_fn = make_ring_occlusion_fn(scene_rep, cfg, bvh_local, n_dev)
        P_ = ids_shard.shape[0]
        root = rng.render_key(cfg.seed)

        def one_sample(accum, sample_idx):
            ps_keys = rng.pixel_sample_keys(
                root, ids_shard, jnp.full((P_,), sample_idx, jnp.int32))
            ro, rd = generate_rays(scene_rep.camera, cfg, ids_shard, ps_keys)
            radiance = trace_paths(scene_rep, cfg, trace_fn, ro, rd, ps_keys,
                                   occl_fn=occl_fn)
            return accum + radiance, None

        accum, _ = jax.lax.scan(
            one_sample, jnp.zeros((P_, 3)), sample_lo + jnp.arange(n))
        return accum / n

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )
    return jax.jit(fn)(scene_rep, child_rows, planes, tri_index, pixel_ids)
