"""Vector / quaternion math for the path tracer.

Batched-first: every function takes arrays whose last axis is the vector
axis (..., 3) and broadcasts, replacing the reference's scalar v3/v4/m3
structs (reference: types.h:54-152, math.h:141-832).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EPS = 1e-8


def dot(a, b):
    """Batched dot product over the trailing axis -> (..., 1) squeezed to (...)."""
    return jnp.sum(a * b, axis=-1)


def vdot(a, b):
    """Batched dot product keeping the trailing axis: (..., 1)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def length_sq(a):
    return jnp.sum(a * a, axis=-1)


def normalize(a, eps: float = EPS):
    """Safe normalize: returns a / max(|a|, eps)."""
    n = jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True))
    return a / jnp.maximum(n, eps)


def lerp(a, b, t):
    return a + (b - a) * t


def reflect(w, n):
    """Reflect direction w about normal n (both (...,3))."""
    return 2.0 * vdot(w, n) * n - w


# ---------------------------------------------------------------------------
# Quaternions. Layout (..., 4) as (x, y, z, w) — matches the reference's v4
# storage (parser.cpp:1225 stores file order w x y z into v4_(x,y,z,w)).
# ---------------------------------------------------------------------------


def quat_from_axis_angle(axis, rad):
    """Unit quaternion for rotation of `rad` radians about `axis`.

    Reference: math.h:726-736 (quaternion(v3 axis, f32 rad)).
    """
    axis = jnp.asarray(axis, jnp.float32)
    rad = jnp.asarray(rad, jnp.float32)
    half = rad / 2.0
    s = jnp.sin(half)
    return jnp.stack(
        [axis[..., 0] * s, axis[..., 1] * s, axis[..., 2] * s, jnp.cos(half)],
        axis=-1,
    )


def quat_mul(q0, q1):
    """Hamilton product q0 * q1. Reference: math.h:824-832."""
    x0, y0, z0, w0 = jnp.moveaxis(q0, -1, 0)
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    return jnp.stack(
        [
            w0 * x1 + w1 * x0 + (y0 * z1 - z0 * y1),
            w0 * y1 + w1 * y0 + (z0 * x1 - x0 * z1),
            w0 * z1 + w1 * z0 + (x0 * y1 - y0 * x1),
            w0 * w1 - (x0 * x1 + y0 * y1 + z0 * z1),
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by unit quaternion q (..., 4).

    Same rotation-matrix form as the reference (math.h:773-793).
    """
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_matrix(q):
    """3x3 rotation matrix (rows) from unit quaternion. math.h:778-786."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Orthonormal frames
# ---------------------------------------------------------------------------


def build_frame(n):
    """Orthonormal basis (t, b, n) given unit normal n (..., 3).

    Branch-free version of the reference's sample_lobe frame
    (ray.cpp:1065-1091): uses the Z-cross construction away from the poles
    and a stable fallback near |n_z| ~= 1 via jnp.where.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    near_pole = jnp.abs(nz) > 0.999
    # generic: b = normalize(cross(Z, n)) = normalize((-ny, nx, 0))
    inv = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + ny * ny, EPS * EPS))
    b_generic = jnp.stack([-ny * inv, nx * inv, jnp.zeros_like(nz)], axis=-1)
    # near pole: use X axis to build the frame
    b_pole = jnp.stack([jnp.ones_like(nz), jnp.zeros_like(nz), jnp.zeros_like(nz)], axis=-1)
    b0 = jnp.where(near_pole[..., None], b_pole, b_generic)
    t = normalize(jnp.cross(b0, n))
    b = jnp.cross(n, t)
    return t, b


def frame_to_world(local, n):
    """Map local (x, y, z) coords (z up = n) into world space."""
    t, b = build_frame(n)
    return (
        local[..., 0:1] * t + local[..., 1:2] * b + local[..., 2:3] * n
    )


def rotation_matrix_to_z(axis):
    """Rotation matrix (rows) mapping `axis` direction to +Z.

    Host-side helper (numpy) used by cylinder precompute; mirrors
    rotation_matrix_along_z (ray.cpp:8-33).
    """
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    z = np.array([0.0, 0.0, 1.0])
    c = np.cross(z, a)
    if np.linalg.norm(c) < 1e-9:
        b = np.cross(np.array([1.0, 0.0, 0.0]), a)
        if np.linalg.norm(b) < 1e-9:
            b = np.cross(np.array([0.0, 1.0, 0.0]), a)
    else:
        b = c
    b = b / np.linalg.norm(b)
    cc = np.cross(a, b)
    return np.stack([b, cc, a]).astype(np.float32)
