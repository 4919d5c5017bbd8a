"""BSDF physics tests: energy conservation, sampling/pdf consistency.

The reference has no tests (SURVEY.md §4); these are the furnace/chi²
style checks its shader never got — they would have caught its inverted
Fresnel (ray.cpp:826-831).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from offline_raytracer_tpu.ops import bsdf as B

N_UP = np.array([0.0, 0.0, 1.0], np.float32)


def _mat(kd=(0, 0, 0), ks=(0, 0, 0), kt=(0, 0, 0), ior=1.5, rough=0.3, n=1):
    tile = lambda v: jnp.tile(jnp.asarray(v, jnp.float32)[None], (n, 1))
    return B.MatParams(
        kd=tile(kd), ks=tile(ks), kt=tile(kt),
        ior=jnp.full((n,), ior), roughness=jnp.full((n,), rough))


def _uniform_sphere(n, seed=0):
    rs = np.random.RandomState(seed)
    v = rs.randn(n, 3)
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def test_schlick_fresnel_orientation():
    ks = jnp.array([[0.04, 0.04, 0.04]])
    # normal incidence -> Ks; grazing -> 1 (the reference has it backwards)
    f_normal = B.schlick_fresnel(ks, jnp.array([1.0]))
    f_grazing = B.schlick_fresnel(ks, jnp.array([0.0]))
    np.testing.assert_allclose(np.asarray(f_normal), 0.04, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_grazing), 1.0, atol=1e-6)


def test_ggx_d_normalization():
    # ∫ D(m) cos(m) dm over hemisphere = 1
    n = 200_000
    m = _uniform_sphere(n)
    m[:, 2] = np.abs(m[:, 2])
    cos = m[:, 2]
    for rough in (0.1, 0.3, 0.8):
        d = np.asarray(B.ggx_d(jnp.asarray(cos), jnp.full((n,), rough)))
        integral = (d * cos).mean() * 2 * np.pi  # hemisphere area 2pi
        np.testing.assert_allclose(integral, 1.0, rtol=0.05)


def test_lambert_energy():
    # ∫ f |cos| dω = Kd for pure Lambert (white-furnace closure)
    n = 200_000
    wi = _uniform_sphere(n, 1)
    wi[:, 2] = np.abs(wi[:, 2])
    wo = jnp.tile(jnp.asarray([0.3, 0.1, 0.95]) / np.linalg.norm([0.3, 0.1, 0.95]), (n, 1))
    mat = _mat(kd=(0.6, 0.4, 0.2), n=n)
    nrm = jnp.tile(jnp.asarray(N_UP)[None], (n, 1))
    f = np.asarray(B.eval_bsdf(nrm, jnp.asarray(wi), wo, mat, jnp.zeros(n)))
    integral = f.mean(0) * 2 * np.pi
    np.testing.assert_allclose(integral, [0.6, 0.4, 0.2], rtol=0.05)


def test_pdf_integrates_to_one():
    # mixture pdf is a valid density over the sphere
    n = 400_000
    wi = _uniform_sphere(n, 2)
    wo = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    nrm = jnp.tile(jnp.asarray(N_UP)[None], (n, 1))
    for mat in (_mat(kd=(0.8, 0.8, 0.8), n=n),
                _mat(kd=(0.5, 0.5, 0.5), ks=(0.5, 0.5, 0.5), rough=0.4, n=n)):
        pdf = np.asarray(B.pdf_bsdf(nrm, jnp.asarray(wi), wo, mat))
        integral = pdf.mean() * 4 * np.pi  # full-sphere area
        np.testing.assert_allclose(integral, 1.0, rtol=0.08)


@pytest.mark.parametrize("mat_kw", [
    dict(kd=(0.7, 0.5, 0.3)),
    dict(ks=(0.9, 0.9, 0.9), rough=0.3),
    dict(kd=(0.4, 0.4, 0.4), ks=(0.4, 0.4, 0.4), rough=0.5),
])
def test_sample_eval_pdf_consistency(mat_kw):
    """E[f(wi)/pdf(wi)] over importance samples = ∫f dω (reflectance) ≤ 1
    and matches a uniform-sampling estimate of the same integral."""
    n = 100_000
    mat = _mat(n=n, **mat_kw)
    nrm = jnp.tile(jnp.asarray(N_UP)[None], (n, 1))
    wo_one = np.array([0.4, 0.2, 0.89], np.float32)
    wo_one /= np.linalg.norm(wo_one)
    wo = jnp.tile(jnp.asarray(wo_one)[None], (n, 1))

    @jax.jit
    def importance_estimate(key):
        s = B.sample_bsdf(jax.random.uniform(key, (n, 3)), nrm, wo, mat)
        pdf = B.pdf_bsdf(nrm, s.wi, wo, mat)
        f = B.eval_bsdf(nrm, s.wi, wo, mat, jnp.zeros(n))
        ok = pdf > 1e-7
        est = jnp.where(ok[..., None], f / jnp.maximum(pdf, 1e-7)[..., None], 0.0)
        return est.mean(0)

    @jax.jit
    def uniform_estimate(key):
        v = jax.random.normal(key, (n, 3))
        wi = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        f = B.eval_bsdf(nrm, wi, wo, mat, jnp.zeros(n))
        return f.mean(0) * 4 * jnp.pi

    imp = np.asarray(importance_estimate(jax.random.PRNGKey(0)))
    uni = np.asarray(uniform_estimate(jax.random.PRNGKey(1)))
    assert (imp <= 1.05).all(), f"energy violation: {imp}"
    np.testing.assert_allclose(imp, uni, rtol=0.15, atol=0.02)


def test_transmission_refracts_through():
    """A glass interface must send transmission samples to the far side."""
    n = 20_000
    mat = _mat(kt=(1.0, 1.0, 1.0), ior=1.5, rough=0.05, n=n)
    nrm = jnp.tile(jnp.asarray(N_UP)[None], (n, 1))
    wo = jnp.tile(jnp.asarray([0.0, 0.3, 0.954]) / np.linalg.norm([0.0, 0.3, 0.954]), (n, 1))
    s = B.sample_bsdf(jax.random.uniform(jax.random.PRNGKey(3), (n, 3)), nrm, wo, mat)
    wi_z = np.asarray(s.wi)[:, 2]
    trans = np.asarray(s.is_transmission)
    assert trans.mean() > 0.9
    # transmitted rays go below the surface (wo is above)
    assert (wi_z[trans] < 0).mean() > 0.99


def test_eval_bsdf_differentiable():
    mat = _mat(kd=(0.5, 0.5, 0.5), ks=(0.3, 0.3, 0.3), rough=0.3, n=1)
    nrm = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = jnp.asarray([[0.0, 0.3, 0.954]])
    wi = jnp.asarray([[0.2, -0.3, 0.93]])

    def loss(kd):
        m2 = mat.replace(kd=kd)
        return B.eval_bsdf(nrm, wi, wo, m2, jnp.zeros(1)).sum()

    g = jax.grad(loss)(mat.kd)
    assert np.isfinite(np.asarray(g)).all()
    assert (np.asarray(g) > 0).all()  # more albedo -> more radiance
