"""Megakernel (ops/mega.py) vs the XLA wavefront integrator.

The megakernel consumes the exact same threefry uniforms as
integrator.trace_paths (utils/rng.bounce_uniforms), so with identical
scenes/configs the two paths walk identical random sequences and must
agree to float-reassociation tolerance. Run in interpret mode on the CPU
test backend; the real-chip cross-check lives in bench.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.integrator import trace_paths
from offline_raytracer_tpu.ops import mega
from offline_raytracer_tpu.ops.camera import generate_rays
from offline_raytracer_tpu.render import _trace_builder
from offline_raytracer_tpu.utils import rng


def _both(scene, cfg, R=1280, seed_sample=0):
    """(integrator radiance+stats, megakernel radiance+stats) for R paths.

    R deliberately NOT a multiple of 1024: exercises the pad/park path.
    """
    ids = jnp.arange(R, dtype=jnp.int32) % (cfg.width * cfg.height)
    root = rng.render_key(cfg.seed)
    keys = rng.pixel_sample_keys(
        root, ids, jnp.full((R,), seed_sample, jnp.int32))
    ro, rd = generate_rays(scene.camera, cfg, ids, keys)
    trace_fn, occl_fn = _trace_builder(scene, cfg)
    ref, ref_alive = trace_paths(scene, cfg, trace_fn, ro, rd, keys,
                                 collect_stats=True, occl_fn=occl_fn)
    got, got_alive = mega.render_paths_mega(
        scene, cfg, ro, rd, keys, collect_stats=True, interpret=True)
    return (np.asarray(ref), np.asarray(ref_alive),
            np.asarray(got), np.asarray(got_alive))


def _assert_close(ref, got, atol=2e-4):
    d = np.abs(ref - got)
    rel = d / np.maximum(np.abs(ref), 1e-2)
    assert d.max() < 0.3, f"max abs diff {d.max()}"          # edge flips only
    assert (rel > 1e-3).mean() < 0.002, f"{(rel > 1e-3).mean()}"
    assert abs(ref.mean() - got.mean()) < atol
    # systematic (signed) bias bound per channel: a small-region bias that
    # stays inside the outlier budget must still cancel in the mean
    signed = (got - ref).reshape(-1, 3).mean(0)
    assert np.abs(signed).max() < 1e-4, f"signed channel bias {signed}"


def _cfg(**kw):
    base = dict(width=64, height=64, spp=1, max_bounces=4, enable_dof=False,
                traversal="jnp")
    base.update(kw)
    return RenderConfig(**base)


@pytest.fixture(scope="module")
def bunny_small(ref_data_dir):
    from offline_raytracer_tpu.models.scenes import bunny
    return bunny(64, 64, data_dir=ref_data_dir)


def test_mega_analytic_matches_integrator(analytic_scene):
    cfg = _cfg()
    assert mega.mega_ok(analytic_scene, cfg)
    ref, ra, got, ga = _both(analytic_scene, cfg)
    _assert_close(ref, got)
    np.testing.assert_allclose(ra, ga)  # alive counts are integers: exact


def test_mega_bunny_matches_integrator(bunny_small):
    cfg = _cfg()
    assert mega.mega_ok(bunny_small, cfg)
    ref, ra, got, ga = _both(bunny_small, cfg)
    _assert_close(ref, got)
    np.testing.assert_allclose(ra, ga)


def test_mega_letter_matches_integrator(ref_data_dir):
    from offline_raytracer_tpu.models.scenes import letter
    scene = letter(64, 64, data_dir=ref_data_dir)
    cfg = _cfg()
    ref, ra, got, ga = _both(scene, cfg)
    _assert_close(ref, got)
    np.testing.assert_allclose(ra, ga)


def test_mega_nee_off(bunny_small):
    cfg = _cfg(enable_nee=False)
    ref, _, got, _ = _both(bunny_small, cfg)
    _assert_close(ref, got)


def test_mega_mis_off(bunny_small):
    cfg = _cfg(enable_mis=False)
    ref, _, got, _ = _both(bunny_small, cfg)
    _assert_close(ref, got)


def _shaped_scene():
    """Cylinders + a box (mesh-sampled) light + a cylinder light — the
    testscene.scn feature set (data/testscene.scn, parser.cpp:1144-1182)
    that rounds 1-3 gated OFF the fast path."""
    from offline_raytracer_tpu.scene.build import SceneBuilder

    b = SceneBuilder()
    b.set_camera((0.0, -3.0, 1.2), 0.5, (0.0, 0.0, 0.0, 1.0))
    b.add_material(diffuse=(0.6, 0.6, 0.6))
    b.add_box_minmax((-4, -4, -0.2), (4, 4, 0.0))           # floor
    b.add_material(diffuse=(0.5, 0.3, 0.2), specular=(0.4, 0.4, 0.4),
                   spec_exp=40)
    b.add_cylinder((-0.8, 0.0, 0.0), (0.0, 0.0, 1.2), 0.3)  # upright
    b.add_cylinder((0.2, -0.5, 0.4), (1.0, 0.5, 0.0), 0.2)  # leaning
    b.add_material(diffuse=(0.2, 0.4, 0.7))
    b.add_sphere((0.9, 0.6, 0.35), 0.35)
    b.add_light_material((6.0, 5.0, 4.0))
    b.add_box_minmax((-0.5, -0.5, 2.4), (0.5, 0.5, 2.6))    # box light
    b.add_light_material((2.0, 3.0, 4.0))
    b.add_cylinder((2.0, 2.0, 0.0), (0.0, 0.0, 2.0), 0.15)  # cylinder light
    return b.build(64, 64)


def test_mega_cylinders_and_shaped_lights():
    scene = _shaped_scene()
    cfg = _cfg()
    assert mega.mega_ok(scene, cfg)   # the r3 gate excluded this scene
    ref, ra, got, ga = _both(scene, cfg)
    _assert_close(ref, got)
    np.testing.assert_allclose(ra, ga)


def test_mega_gate_rejects_oversize_tables():
    from offline_raytracer_tpu.scene.build import SceneBuilder

    b = SceneBuilder()
    b.add_material(diffuse=(0.5, 0.5, 0.5))
    for i in range(130):   # > one lane row of spheres
        b.add_sphere((i * 2.0, 0, 0), 0.5)
    assert not mega.mega_ok(b.build(32, 32), _cfg())


def test_mega_small_block():
    """R < 512 exercises pad > R in the host wrapper (ADVICE r3 #1)."""
    scene = _shaped_scene()
    cfg = _cfg()
    ref, ra, got, ga = _both(scene, cfg, R=200)
    _assert_close(ref, got)
    np.testing.assert_allclose(ra, ga)


def test_mega_roughness_from_material(bunny_small):
    cfg = _cfg(roughness_from_material=True)
    ref, _, got, _ = _both(bunny_small, cfg)
    _assert_close(ref, got)
