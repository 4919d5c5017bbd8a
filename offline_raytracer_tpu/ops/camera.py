"""Camera ray generation with thin-lens depth of field.

Reference: camera axes from the .scn quaternion (macos_main.mm:550-556),
NDC pixel -> direction px*X + py*Y - Z (ray.cpp:1214-1220), focal plane
anchored at |cam - (0,0,0.2)| with aperture radius 0.1 (ray.cpp:1198-1199,
1232-1237). All of it batched over a flat pixel-id axis and differentiable
w.r.t. camera parameters.
"""

from __future__ import annotations

import jax.numpy as jnp

from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.scene.types import Camera
from offline_raytracer_tpu.utils import rng
from offline_raytracer_tpu.utils.math import normalize


def make_camera(p, height_ratio, quaternion_xyzw, width, height) -> Camera:
    """Build the camera pytree from .scn parameters (macos_main.mm:550-556).

    Host-side (numpy) on purpose: scene setup happens once per render, and
    eager per-op XLA compiles are expensive on small hosts.
    """
    import numpy as np

    p = np.asarray(p, np.float32)
    q = np.asarray(quaternion_xyzw, np.float64)
    qv, w = q[:3], q[3]

    def rot(v):
        t = 2.0 * np.cross(qv, v)
        return (v + w * t + np.cross(qv, t)).astype(np.float32)

    aspect = width / height
    return Camera(
        p=jnp.asarray(p),
        x_axis=jnp.asarray(height_ratio * aspect * rot([1.0, 0.0, 0.0])),
        y_axis=jnp.asarray(height_ratio * rot([0.0, 1.0, 0.0])),
        z_axis=jnp.asarray(rot([0.0, 0.0, 1.0])),
    )


def generate_rays(cam: Camera, cfg: RenderConfig, pixel_ids, ps_keys):
    """Primary rays for flat pixel ids (R,) -> (origin (R,3), dir (R,3)).

    pixel_id = y * width + x with y = 0 the *bottom* row, matching the
    reference's NDC mapping pixel_y = 2y/H - 1 (ray.cpp:1215-1216).
    ps_keys: per-ray counter-based keys (see utils.rng determinism contract).
    """
    x = (pixel_ids % cfg.width).astype(jnp.float32)
    y = (pixel_ids // cfg.width).astype(jnp.float32)

    u = rng.tagged_uniforms(ps_keys, rng.CAMERA_TAG, 4)
    if cfg.pixel_jitter:
        x = x + u[..., 0]
        y = y + u[..., 1]

    px = 2.0 * x / cfg.width - 1.0
    py = 2.0 * y / cfg.height - 1.0

    cam_to_pixel = normalize(
        px[..., None] * cam.x_axis + py[..., None] * cam.y_axis - cam.z_axis
    )

    if not cfg.enable_dof:
        origin = jnp.broadcast_to(cam.p, cam_to_pixel.shape)
        return origin, cam_to_pixel

    focal_len = jnp.linalg.norm(cam.p - jnp.array([0.0, 0.0, cfg.focal_anchor_z]))
    focal_point = cam.p + focal_len * cam_to_pixel

    theta = 2.0 * jnp.pi * u[..., 2]
    if cfg.aperture_disk:
        r = cfg.aperture_radius * jnp.sqrt(u[..., 3])
    else:
        # reference samples the aperture rim only (ring bokeh, ray.cpp:1232)
        r = jnp.full_like(theta, cfg.aperture_radius)
    origin = (
        cam.p
        + (r * jnp.cos(theta))[..., None] * cam.x_axis
        + (r * jnp.sin(theta))[..., None] * cam.y_axis
        - 0.1 * cam.z_axis  # forward nudge, part of the ref camera (:1234)
    )
    direction = normalize(focal_point - origin)
    return origin, direction
