"""Area-light sampling: next-event estimation with MIS.

The reference has a light table and a sphere-light sampler
(sample_random_lights, ray.cpp:528-601) but its explicit-connection branch
is dead code behind ``#if 0`` (ray.cpp:1285-1327), so reference renders are
BSDF-sampling only. Here NEE actually works and combines with BSDF
sampling via the balance heuristic (SURVEY.md §7 step 4: build the
*intended* physics).

Sampling is uniform over the sphere surface with pdf 1/(4 pi r^2 L) —
the reference's pdf claim (ray.cpp:568); its actual angle-uniform sampling
(random.h:100-117) did not match that pdf, ours does.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from offline_raytracer_tpu.scene.types import Scene
from offline_raytracer_tpu.utils.math import normalize

PI = jnp.pi


@flax.struct.dataclass
class LightSample:
    p: jnp.ndarray         # (R, 3) point on the light surface
    normal: jnp.ndarray    # (R, 3) light surface normal
    emit: jnp.ndarray      # (R, 3) emitted radiance
    pdf_area: jnp.ndarray  # (R,) area-measure pdf (includes 1/L pick prob)
    mat: jnp.ndarray       # (R,) light material index


def sample_lights(key, scene: Scene, shape) -> LightSample:
    """Uniformly pick one of L sphere lights and a point on its surface."""
    lights = scene.lights
    L = lights.radius.shape[0]
    k_pick, k_dir = jax.random.split(key)
    idx = jax.random.randint(k_pick, shape, 0, max(L, 1))
    u = jax.random.uniform(k_dir, shape + (2,))
    # uniform on the unit sphere
    z = 1.0 - 2.0 * u[..., 0]
    phi = 2.0 * PI * u[..., 1]
    s = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    n = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], -1)

    center = lights.center[idx]
    radius = lights.radius[idx]
    p = center + radius[..., None] * n
    mat = lights.mat[idx]
    emit = scene.materials.emit[mat]
    pdf_area = 1.0 / (4.0 * PI * radius**2 * L)
    return LightSample(p=p, normal=n, emit=emit, pdf_area=pdf_area, mat=mat)


def light_pdf_area(scene: Scene, light_idx):
    """Area pdf of sample_lights for a given sphere-light index."""
    L = scene.lights.radius.shape[0]
    r = scene.lights.radius[jnp.clip(light_idx, 0, max(L - 1, 0))]
    return 1.0 / (4.0 * PI * r**2 * max(L, 1))


def solid_angle_pdf(pdf_area, dist, cos_light):
    """Convert area pdf to solid-angle pdf at the shading point."""
    return pdf_area * dist**2 / jnp.maximum(jnp.abs(cos_light), 1e-6)


def mis_balance(p_a, p_b):
    """Balance heuristic weight for strategy a vs b."""
    return p_a / jnp.maximum(p_a + p_b, 1e-12)
