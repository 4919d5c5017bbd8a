"""Path-replay backprop (replay.py): the differentiable megakernel route.

The kernel records per-bounce discrete outcomes (hit ids, NEE visibility);
the XLA replay regenerates the identical paths from the counter-based RNG
and recomputes them attached. These tests pin the contract:

- replay radiance == kernel radiance (same paths, same estimator);
- gradients through the replay == gradients through the plain XLA
  wavefront (both are the detached-sampling estimator on the same draws);
- the custom_vjp wrapper (mega_paths_diff) exposes both as one callable:
  forward = kernel, backward = replay.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from offline_raytracer_tpu.config import RenderConfig
from offline_raytracer_tpu.integrator import trace_paths
from offline_raytracer_tpu.ops import mega
from offline_raytracer_tpu.ops.camera import generate_rays
from offline_raytracer_tpu.render import _trace_builder
from offline_raytracer_tpu.replay import mega_paths_diff, replay_paths
from offline_raytracer_tpu.utils import rng


def _cfg(**kw):
    base = dict(width=48, height=48, spp=1, max_bounces=4, enable_dof=False,
                traversal="jnp")
    base.update(kw)
    return RenderConfig(**base)


@pytest.fixture(scope="module")
def bunny_small(ref_data_dir):
    from offline_raytracer_tpu.models.scenes import bunny
    return bunny(48, 48, data_dir=ref_data_dir)


def _rays(scene, cfg, R=1280):
    ids = jnp.arange(R, dtype=jnp.int32) % (cfg.width * cfg.height)
    root = rng.render_key(cfg.seed)
    keys = rng.pixel_sample_keys(
        root, ids, jnp.zeros((R,), jnp.int32))
    ro, rd = generate_rays(scene.camera, cfg, ids, keys)
    return ro, rd, keys


def test_replay_matches_kernel_radiance(analytic_scene):
    cfg = _cfg()
    ro, rd, keys = _rays(analytic_scene, cfg)
    rad_k = mega.render_paths_mega(
        analytic_scene, cfg, ro, rd, keys, interpret=True)
    rad_r = replay_paths(analytic_scene, cfg, ro, rd, keys, interpret=True)
    np.testing.assert_allclose(
        np.asarray(rad_k), np.asarray(rad_r), rtol=2e-4, atol=2e-4)


def test_replay_matches_kernel_radiance_bunny(ref_data_dir):
    from offline_raytracer_tpu.models.scenes import bunny
    scene = bunny(48, 48, data_dir=ref_data_dir)
    cfg = _cfg()
    ro, rd, keys = _rays(scene, cfg)
    rad_k = mega.render_paths_mega(scene, cfg, ro, rd, keys, interpret=True)
    rad_r = replay_paths(scene, cfg, ro, rd, keys, interpret=True)
    a, b = np.asarray(rad_k), np.asarray(rad_r)
    # the kernel's approximate-reciprocal hit t allows rare lane flips
    d = np.abs(a - b)
    assert d.max() < 0.3
    assert (d > 1e-3).mean() < 0.002
    assert abs(a.mean() - b.mean()) < 2e-4


def test_replay_grads_match_xla_path(analytic_scene):
    """d(loss)/d(diffuse, sphere centers) via replay == via XLA wavefront."""
    cfg = _cfg()
    ro, rd, keys = _rays(analytic_scene, cfg, R=1024)

    def loss_replay(diffuse, centers):
        sc = analytic_scene.replace(
            materials=analytic_scene.materials.replace(diffuse=diffuse),
            spheres=analytic_scene.spheres.replace(center=centers))
        return jnp.mean(mega_paths_diff(sc, cfg, ro, rd, keys,
                                        interpret=True))

    def loss_xla(diffuse, centers):
        sc = analytic_scene.replace(
            materials=analytic_scene.materials.replace(diffuse=diffuse),
            spheres=analytic_scene.spheres.replace(center=centers))
        trace_fn, occl_fn = _trace_builder(sc, cfg)
        return jnp.mean(trace_paths(sc, cfg, trace_fn, ro, rd, keys,
                                    occl_fn=occl_fn))

    args = (analytic_scene.materials.diffuse, analytic_scene.spheres.center)
    v_r, g_r = jax.value_and_grad(loss_replay, argnums=(0, 1))(*args)
    v_x, g_x = jax.value_and_grad(loss_xla, argnums=(0, 1))(*args)
    assert abs(float(v_r) - float(v_x)) < 2e-4
    for a, b in zip(g_r, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    assert any(float(jnp.abs(g).max()) > 1e-6 for g in g_r), "grads all zero"


def test_replay_grads_under_jit(analytic_scene):
    cfg = _cfg()
    ro, rd, keys = _rays(analytic_scene, cfg, R=1024)

    @jax.jit
    def step(diffuse):
        sc = analytic_scene.replace(
            materials=analytic_scene.materials.replace(diffuse=diffuse))
        return jax.value_and_grad(
            lambda d_: jnp.mean(mega_paths_diff(
                sc.replace(materials=sc.materials.replace(diffuse=d_)),
                cfg, ro, rd, keys, interpret=True)))(diffuse)

    v, g = step(analytic_scene.materials.diffuse)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 1e-6


def test_replay_vertex_grads_bunny(ref_data_dir):
    """Mesh-vertex gradients flow through the replayed triangle winners."""
    from offline_raytracer_tpu.models.scenes import bunny
    scene = bunny(48, 48, data_dir=ref_data_dir)
    cfg = _cfg()
    ro, rd, keys = _rays(scene, cfg, R=1024)

    def loss(v0):
        sc = scene.replace(triangles=scene.triangles.replace(v0=v0))
        return jnp.mean(mega_paths_diff(sc, cfg, ro, rd, keys,
                                        interpret=True))

    g = jax.grad(loss)(scene.triangles.v0)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


def test_replay_tiered_compaction_matches_full(bunny_small):
    """cfg.replay_tiers shrinks the replay batch at tier bounces; with
    capacity above the actual survivor count the compact replay is EXACT —
    same radiance, same gradients (integrator.py tiered-compaction notes).
    """
    import jax

    cfg = _cfg(max_bounces=6)
    R = 1280
    ro, rd, keys = _rays(bunny_small, cfg, R)
    _, ids, vis = mega.render_paths_mega(
        bunny_small, cfg, ro, rd, keys, interpret=True, collect_records=True)
    ids = jax.lax.stop_gradient(ids)
    vis = jax.lax.stop_gradient(vis)

    def gradval(c):
        def loss(diffuse, v0):
            sc = bunny_small.replace(
                materials=bunny_small.materials.replace(diffuse=diffuse),
                triangles=bunny_small.triangles.replace(v0=v0))
            return jnp.mean(trace_paths(sc, c, None, ro, rd, keys,
                                        replay=(ids, vis)))
        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(
            bunny_small.materials.diffuse, bunny_small.triangles.v0)

    v1, g1 = gradval(cfg)
    v2, g2 = gradval(cfg.replace(replay_tiers=((2, 4), (4, 16))))
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(g1, g2):
        # atol covers gather/scatter-add reassociation noise on
        # near-zero entries; the relative tolerance does the real work
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
