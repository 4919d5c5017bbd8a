"""Depth-of-field camera and roughness-mapping properties (VERDICT r2 #7).

The reference's thin-lens model (ray.cpp:1194-1237): focal plane anchored
at |cam - (0,0,0.2)|, aperture samples on the RIM (ring bokeh), origin
nudged forward 0.1 along -z_axis. These were untested through round 2.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.ops import bsdf as bsdf_ops
from offline_raytracer_tpu.ops.camera import generate_rays, make_camera
from offline_raytracer_tpu.utils import rng


@pytest.fixture(scope="module")
def cam():
    h = np.pi / 4
    return make_camera((4.0, 0.0, 1.5), 0.4,
                       [0, np.sin(h), 0, np.cos(h)], 64, 64)


def _rays(cam, cfg, n=256, pixel=2080):
    ids = jnp.full((n,), pixel, jnp.int32)
    keys = rng.pixel_sample_keys(
        rng.render_key(0), ids, jnp.arange(n, dtype=jnp.int32))
    return generate_rays(cam, cfg, ids, keys)


def test_dof_rays_meet_at_focal_point(cam):
    """Every aperture sample of a pixel passes through one focal point —
    the defining thin-lens property (ray.cpp:1221, 1237)."""
    cfg = RenderConfig(width=64, height=64, enable_dof=True,
                       pixel_jitter=False)
    ro, rd = _rays(cam, cfg)
    # the focal point is where the pinhole ray meets the focal sphere
    cfg_pin = cfg.replace(enable_dof=False)
    po, pd = _rays(cam, cfg_pin, n=1)
    focal_len = jnp.linalg.norm(
        cam.p - jnp.array([0.0, 0.0, cfg.focal_anchor_z]))
    fp = po[0] + focal_len * pd[0]
    # distance from fp to each DOF ray line ~ 0
    rel = fp[None, :] - ro
    d = jnp.linalg.norm(jnp.cross(rel, rd), axis=-1)  # |rd| = 1
    assert float(jnp.max(d)) < 1e-4


def test_dof_rim_vs_disk_aperture(cam):
    """Reference samples the aperture RIM (ring bokeh, ray.cpp:1232-1234);
    aperture_disk=True fills the disk — radii must differ statistically."""
    cfg_rim = RenderConfig(width=64, height=64, enable_dof=True,
                           pixel_jitter=False, aperture_disk=False)
    cfg_disk = cfg_rim.replace(aperture_disk=True)
    nudged = jnp.asarray(cam.p) - 0.1 * cam.z_axis
    ro_rim, _ = _rays(cam, cfg_rim)
    ro_disk, _ = _rays(cam, cfg_disk)

    def radii(ro):
        rel = ro - nudged[None]
        # project out the z_axis component (origins live in the lens plane)
        return np.asarray(jnp.linalg.norm(rel, axis=-1))

    r_rim = radii(ro_rim)
    r_disk = radii(ro_disk)
    # rim: all origins at one radius (ring bokeh); disk: radii spread over
    # [0, rim]. Radii are measured in world units (the lens plane basis is
    # the scaled x/y camera axes, so the world radius is aperture_radius *
    # |x_axis| at aspect 1).
    np.testing.assert_allclose(r_rim, r_rim[0], rtol=1e-4)
    assert r_disk.std() > 0.05 * r_rim[0]
    assert r_disk.max() <= r_rim[0] * (1 + 1e-4)
    assert r_disk.min() < 0.8 * r_rim[0]


def test_dof_off_is_pinhole(cam):
    cfg = RenderConfig(width=64, height=64, enable_dof=False,
                       pixel_jitter=False)
    ro, _ = _rays(cam, cfg, n=16)
    np.testing.assert_allclose(
        np.asarray(ro), np.broadcast_to(np.asarray(cam.p), (16, 3)), atol=0)


def test_roughness_from_material_monotone():
    """alpha = sqrt(2/(exp+2)) (gather_mat_params): higher Phong exponent
    -> narrower GGX lobe, replacing the reference's hardcoded 0.01
    (ray.cpp:1194)."""
    from offline_raytracer_tpu.scene.types import make_materials

    exps = np.array([1.0, 10.0, 100.0, 1000.0], np.float32)
    mats = make_materials(
        diffuse=np.zeros((4, 3)), specular=np.ones((4, 3)),
        spec_exp=exps, transmission=np.zeros((4, 3)),
        ior=np.ones(4), emit=np.zeros((4, 3)), is_light=np.zeros(4, bool))
    mp = bsdf_ops.gather_mat_params(
        mats, jnp.arange(4), 0.01, roughness_from_material=True)
    r = np.asarray(mp.roughness)
    assert np.all(np.diff(r) < 0), r          # strictly decreasing
    np.testing.assert_allclose(r, np.sqrt(2.0 / (exps + 2.0)), rtol=1e-6)

    # and the sampled lobe tightens: mean alignment with the mirror
    # direction increases with the exponent
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4096, 1))
    wo = jnp.tile(jnp.asarray([[np.sin(0.3), 0.0, np.cos(0.3)]],
                              dtype=jnp.float32), (4096, 1))
    mirror = jnp.asarray([-np.sin(0.3), 0.0, np.cos(0.3)], dtype=jnp.float32)
    keys = rng.pixel_sample_keys(
        rng.render_key(1), jnp.arange(4096, dtype=jnp.int32),
        jnp.zeros((4096,), jnp.int32))
    u = rng.tagged_uniforms(keys, 7, 3)
    u = u.at[:, 2].set(0.5)                    # always pick the GGX lobe
    align = []
    for m in range(4):
        mp1 = bsdf_ops.gather_mat_params(
            mats, jnp.full((4096,), m), 0.01, roughness_from_material=True)
        samp = bsdf_ops.sample_bsdf(u, n, wo, mp1)
        align.append(float(jnp.mean(jnp.sum(samp.wi * mirror, -1))))
    assert all(b > a for a, b in zip(align, align[1:])), align
