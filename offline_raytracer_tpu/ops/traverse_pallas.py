"""Pallas TPU megakernel: BVH packet traversal with on-chip scene.

The on-chip version of the packet traversal in ops/traverse.py — the
TPU-native answer to the reference's hot loop (raycast_bvh ray.cpp:624-822
+ the dormant 4-wide NEON lane library meka_simd_4x.h):

- grid over ray blocks; each block is (SUB, 128) = SUB*128 rays living in
  VMEM as SoA component planes (the 8x128 VPU lane shape — the direct
  generalization of the reference's 4-wide LaneF32);
- the packed LBVH (ops/bvh.py) is memory-space-matched to its access
  pattern: internal-node child AABBs (N_int, 12) sit in **SMEM** where
  scalar dynamic addressing is native; the (12, M, 128) triangle
  coefficient planes sit in **VMEM** where a leaf is one dynamic-row load
  per plane;
- ONE scalar node stack in SMEM shared by the block — node ids are
  scalars, so there are no per-lane gathers anywhere (the VPU cannot
  gather);
- a leaf test is the affine-barycentric all-pairs sweep: (SUB, 128 rays)
  x (128 triangles) broadcast FMAs, pure VPU work;
- per-lane hit state (best_t, best_slot) is masked-select updated —
  exactly the `overwrite` masked-lane model of meka_simd_4x.h:239-250.

Scenes whose BVH exceeds the VMEM/SMEM budget fall back to the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from offline_raytracer_tpu.ops.bvh import LEAF, TriBVH

INF = 3.4e38  # plain float: jnp scalars would be captured as kernel constants
LANE = 128

DEFAULT_SUB = 8                    # 8 x 128 = 1024 rays per block
VMEM_BUDGET = 12 * 1024 * 1024     # planes + temps headroom out of ~16 MB
SMEM_NODE_LIMIT = 8192             # max internal nodes kept in SMEM (384 KB)


def bvh_vmem_bytes(bvh: TriBVH) -> int:
    return int(bvh.planes.size) * 4


def fits_vmem(bvh: TriBVH, sub: int = DEFAULT_SUB) -> bool:
    # ~6 live (sub, 128, 128) f32 intermediates in the leaf sweep
    temps = 6 * sub * LANE * LANE * 4
    if bvh.child_rows.shape[0] > SMEM_NODE_LIMIT:
        return False
    return bvh_vmem_bytes(bvh) + temps + (1 << 20) < VMEM_BUDGET


def _kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tfar_ref,
    child_ref, planes_ref,
    t_out_ref, slot_out_ref,
    stack_ref,
    *, first_leaf: int, m_occ: int, max_stack: int, t_min: float,
    any_hit: bool,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    def slab_near(node, off, best_t):
        """Packet entry distance vs one child AABB (SMEM scalars).

        child_ref is FLAT (n_internal*12,): SMEM 2-D arrays get padded to
        128 lanes (1 MB SMEM blows up on >1023-node trees); flat scalar
        indexing stores exactly 12 floats per node."""
        base = node * 12 + off
        bx0 = (child_ref[base + 0] - ox) * inv_dx
        by0 = (child_ref[base + 1] - oy) * inv_dy
        bz0 = (child_ref[base + 2] - oz) * inv_dz
        bx1 = (child_ref[base + 3] - ox) * inv_dx
        by1 = (child_ref[base + 4] - oy) * inv_dy
        bz1 = (child_ref[base + 5] - oz) * inv_dz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(bx0, bx1), jnp.minimum(by0, by1)),
            jnp.minimum(bz0, bz1))
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(bx0, bx1), jnp.maximum(by0, by1)),
            jnp.maximum(bz0, bz1))
        near = jnp.maximum(tn, t_min)
        return jnp.where((tf >= near) & (near < best_t), near, INF)

    def leaf_fn(carry):
        sp, node, best_t, best_i = carry
        leaf = node - first_leaf
        if m_occ > 1:
            leaf = jnp.clip(leaf, 0, m_occ - 1)
        else:
            leaf = leaf * 0
        row = lambda k: planes_ref[k, leaf, :]          # (128,) per plane
        s1x, s1y, s1z, c1 = row(0), row(1), row(2), row(3)
        s2x, s2y, s2z, c2 = row(4), row(5), row(6), row(7)
        nx, ny, nz, cw = row(8), row(9), row(10), row(11)

        def pairs(rx, ry, rz, tx, ty, tz, cc=None):
            # (SUB, 128 rays) x (128 tris) -> (SUB, 128, 128)
            out = (rx[:, :, None] * tx[None, None, :]
                   + ry[:, :, None] * ty[None, None, :]
                   + rz[:, :, None] * tz[None, None, :])
            if cc is not None:
                out = out + cc[None, None, :]
            return out

        o_w = pairs(ox, oy, oz, nx, ny, nz, cw)
        d_w = pairs(dx, dy, dz, nx, ny, nz)
        ok_w = jnp.abs(d_w) > 1e-12
        t = -o_w / jnp.where(ok_w, d_w, 1.0)
        u = pairs(ox, oy, oz, s1x, s1y, s1z, c1) + t * pairs(dx, dy, dz, s1x, s1y, s1z)
        v = pairs(ox, oy, oz, s2x, s2y, s2z, c2) + t * pairs(dx, dy, dz, s2x, s2y, s2z)
        ok = (
            ok_w & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= t_min) & (t < best_t[:, :, None])
        )
        t = jnp.where(ok, t, INF)
        tmin = t.min(-1)                                 # (SUB, 128)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 2)
        lane = jnp.min(jnp.where(t <= tmin[:, :, None], lane_iota, 1 << 30), -1)
        better = tmin < best_t
        best_i = jnp.where(better, leaf * LEAF + lane, best_i)
        best_t = jnp.where(better, tmin, best_t)
        if any_hit:
            # occlusion query: a found hit proves the answer — collapse the
            # lane's t-bound so it never pulls another descent
            best_t = jnp.where(best_i >= 0, t_min, best_t)
        return sp, best_t, best_i

    def internal_fn(carry):
        sp, node, best_t, best_i = carry
        near1 = slab_near(node, 0, best_t)
        near2 = slab_near(node, 6, best_t)
        any1 = jnp.any(near1 < INF)
        any2 = jnp.any(near2 < INF)
        m1 = jnp.min(near1)
        m2 = jnp.min(near2)
        c1 = 2 * node + 1
        first_is_1 = m1 <= m2
        near_c = jnp.where(first_is_1, c1, c1 + 1)
        far_c = jnp.where(first_is_1, c1 + 1, c1)
        push_far = jnp.where(first_is_1, any2, any1)
        push_near = jnp.where(first_is_1, any1, any2)

        @pl.when(push_far)
        def _():
            stack_ref[sp] = far_c

        sp = sp + push_far.astype(jnp.int32)

        @pl.when(push_near)
        def _():
            stack_ref[sp] = near_c

        sp = sp + push_near.astype(jnp.int32)
        return sp, best_t, best_i

    def body(carry):
        sp, best_t, best_i = carry
        node = stack_ref[sp - 1]
        sp = sp - 1
        sp, best_t, best_i = jax.lax.cond(
            node >= first_leaf, leaf_fn, internal_fn,
            (sp, node, best_t, best_i))
        return sp, best_t, best_i

    stack_ref[0] = 0
    tfar = tfar_ref[:]
    init = (
        jnp.int32(1),
        tfar,                                   # seeded t bound
        jnp.full(ox.shape, -1, jnp.int32),
    )
    if any_hit:
        # stop as soon as every live lane is resolved (hit found, or the
        # lane was launched dead: tfar <= t_min)
        def cond(c):
            _, best_t, best_i = c
            undone = (best_i < 0) & (tfar > t_min)
            return (c[0] > 0) & jnp.any(undone)
    else:
        def cond(c):
            return c[0] > 0
    _, best_t, best_i = jax.lax.while_loop(cond, body, init)
    t_out_ref[:] = best_t
    slot_out_ref[:] = best_i


@functools.partial(
    jax.jit,
    static_argnames=("first_leaf", "m_occ", "t_min", "max_stack", "sub",
                     "any_hit", "interpret"))
def _traverse_pallas(
    planes7, child_smem, coeff_planes,
    *, first_leaf, m_occ, t_min, max_stack, sub, any_hit=False,
    interpret=False,
):
    grid = (planes7[0].shape[0] // sub,)

    ray_spec = pl.BlockSpec((sub, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    child_spec = pl.BlockSpec(
        child_smem.shape, lambda i: (0,), memory_space=pltpu.SMEM)
    coeff_spec = pl.BlockSpec(
        coeff_planes.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, first_leaf=first_leaf, m_occ=m_occ,
        max_stack=max_stack, t_min=t_min, any_hit=any_hit)

    t, slot = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 7 + [child_spec, coeff_spec],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct(planes7[0].shape, jnp.float32),
            jax.ShapeDtypeStruct(planes7[0].shape, jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((max_stack,), jnp.int32)],
        interpret=interpret,
    )(*planes7, child_smem, coeff_planes)
    return t, slot


def bvh_hit_ts_pallas(bvh: TriBVH, ro, rd, t_min, t_far=None,
                      max_stack: int = 64, sub: int = DEFAULT_SUB,
                      any_hit: bool = False, interpret: bool = False):
    """Pallas packet traversal. ro, rd: (R, 3) -> (t (R,), slot (R,)).

    Pads the ray set to a whole number of (sub*128)-ray blocks.

    ``t_far``: optional (R,) seed for the per-ray t bound — hits beyond it
    are ignored and nodes beyond it are never descended (shadow rays pass
    the light distance; ``t_far <= t_min`` marks a lane dead on launch).
    ``any_hit``: occlusion mode — any qualifying hit resolves the lane and
    the block exits as soon as every live lane is resolved.
    """
    R = ro.shape[0]
    block = sub * LANE
    n_blocks = -(-R // block)
    pad = n_blocks * block - R
    if t_far is None:
        t_far = jnp.full((R,), INF, ro.dtype)
    # pad rays point +x from far outside the scene with a dead t bound
    far = jnp.full((pad, 3), 1e8, ro.dtype)
    dirx = jnp.tile(jnp.array([[1.0, 0.0, 0.0]], ro.dtype), (pad, 1))
    ro_p = jnp.concatenate([ro, far]) if pad else ro
    rd_p = jnp.concatenate([rd, dirx]) if pad else rd
    tf_p = jnp.concatenate([t_far, jnp.zeros((pad,), ro.dtype)]) if pad else t_far

    planes7 = tuple(
        p.reshape(n_blocks * sub, LANE)
        for p in (ro_p[:, 0], ro_p[:, 1], ro_p[:, 2],
                  rd_p[:, 0], rd_p[:, 1], rd_p[:, 2], tf_p))
    child_smem = bvh.child_rows[:, :12].reshape(-1)

    t, slot = _traverse_pallas(
        planes7, child_smem, bvh.planes,
        first_leaf=bvh.first_leaf, m_occ=bvh.m_occ,
        t_min=float(t_min), max_stack=max_stack, sub=sub,
        any_hit=any_hit, interpret=interpret)
    t = t.reshape(-1)[:R]
    slot = slot.reshape(-1)[:R]
    return jnp.where(slot >= 0, t, jnp.inf), slot
