"""Differentiable megakernel rendering via path-replay backprop.

The fused wavefront kernel (ops/mega.py) is the fast forward path but a
``pallas_call`` has no VJP. The reference has no gradients at all (the
north star adds them); rounds 1-3 paid for gradients by re-tracing on the
slow XLA path. This module closes the gap with the standard
detached-discontinuity factorization:

- FORWARD: the megakernel traces the paths and emits, per bounce, the
  *discrete* outcomes — winning primitive id and NEE shadow visibility
  (ops/mega.py collect_records).
- BACKWARD: those records replay through the pure-XLA integrator
  (integrator.trace_paths(replay=...)): the closest hit is recomputed
  ATTACHED from the known winner (ops/intersect.hit_from_ids — one gather
  + one primitive intersection, no traversal), the counter-based RNG
  regenerates the identical sampled directions / RR decisions / light
  points, and jax.vjp of that replay yields d(image)/d(scene, rays).

So a gradient render costs one kernel launch + one traversal-free
differentiable replay, instead of a full XLA wavefront re-trace — the
same estimator, the same paths, with visibility discontinuities detached
(the documented v1 gradient regime, SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from offline_raytracer_tpu.integrator import trace_paths
from offline_raytracer_tpu.ops import mega


def _rekey(kd):
    return jax.random.wrap_key_data(kd, impl="threefry2x32")


def _f0_like(x):
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _mega_paths(scene, ro, rd, kd, cfg, interpret):
    return mega.render_paths_mega(
        scene, cfg, ro, rd, _rekey(kd), interpret=interpret)


def _mega_paths_fwd(scene, ro, rd, kd, cfg, interpret):
    rad, ids, vis = mega.render_paths_mega(
        scene, cfg, ro, rd, _rekey(kd), interpret=interpret,
        collect_records=True)
    return rad, (scene, ro, rd, kd, ids, vis)


def _mega_paths_bwd(cfg, interpret, res, g):
    scene, ro, rd, kd, ids, vis = res

    def replay_f(scene_, ro_, rd_):
        return trace_paths(scene_, cfg, None, ro_, rd_, _rekey(kd),
                           replay=(ids, vis))

    _, vjp = jax.vjp(replay_f, scene, ro, rd)
    d_scene, d_ro, d_rd = vjp(g)
    return d_scene, d_ro, d_rd, _f0_like(kd)


_mega_paths.defvjp(_mega_paths_fwd, _mega_paths_bwd)


def mega_paths_diff(scene, cfg, ro, rd, ps_keys, interpret=False):
    """Differentiable drop-in for integrator.trace_paths on the mega path.

    Forward value = the megakernel's radiance (one fused launch);
    gradients = VJP of the traversal-free replay. Primal and replay agree
    draw-for-draw (asserted by tests/test_replay.py) up to the kernel's
    approximate-reciprocal hit distances.
    """
    kd = jax.random.key_data(ps_keys)
    return _mega_paths(scene, ro, rd, kd, cfg, interpret)


def replay_paths(scene, cfg, ro, rd, ps_keys, interpret=False):
    """Pure replay render (records from a fresh kernel launch, radiance
    from the XLA replay). Differentiable end-to-end in one expression —
    used by tests to compare against the kernel's own radiance."""
    sg = jax.lax.stop_gradient
    scene_d = jax.tree_util.tree_map(sg, scene)  # no tangents may enter
    #                                              the (VJP-less) kernel
    _, ids, vis = mega.render_paths_mega(
        scene_d, cfg, sg(ro), sg(rd),
        ps_keys, interpret=interpret, collect_records=True)
    return trace_paths(scene, cfg, None, ro, rd, ps_keys,
                       replay=(ids, vis))
