import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
from offline_raytracer_tpu.ops.bvh import build_tri_bvh
from offline_raytracer_tpu.ops import traverse as T
from offline_raytracer_tpu.ops import traverse_cull as TC

rng = np.random.default_rng(0)
N = 700   # several leaves
c = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
d1 = rng.normal(0, 0.08, (N, 3)).astype(np.float32)
d2 = rng.normal(0, 0.08, (N, 3)).astype(np.float32)
v0, v1, v2 = c, c + d1, c + d2
bvh = build_tri_bvh(v0, v1, v2, np.zeros(N, np.int32))
print("m_occ", bvh.m_occ, "leaf_bounds", bvh.leaf_bounds.shape)

R = 512
ro = rng.uniform(-3, 3, (R, 3)).astype(np.float32)
rd = rng.normal(0, 1, (R, 3)).astype(np.float32)
rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)

t_ref, s_ref = T.bvh_hit_ts(bvh, ro_j, rd_j, 1e-4)
t_c, s_c = TC.bvh_hit_ts_cull(bvh, ro_j, rd_j, 1e-4, interpret=True)
t_ref, s_ref, t_c, s_c = map(np.asarray, (t_ref, s_ref, t_c, s_c))
hit_ref = s_ref >= 0; hit_c = s_c >= 0
assert (hit_ref == hit_c).all(), (hit_ref.sum(), hit_c.sum(), np.where(hit_ref != hit_c))
m = hit_ref
assert np.allclose(t_ref[m], t_c[m], rtol=1e-5), np.abs(t_ref[m]-t_c[m]).max()
assert (s_ref[m] == s_c[m]).mean() > 0.999, (s_ref[m] != s_c[m]).sum()
print("closest-hit OK:", m.sum(), "hits /", R)

# any-hit with t_far
tfar = jnp.full((R,), 2.0)
occ_ref = T.bvh_hit_ts(bvh, ro_j, rd_j, 1e-4, t_far=tfar, any_hit=True)[1] >= 0
occ_c = TC.bvh_hit_ts_cull(bvh, ro_j, rd_j, 1e-4, t_far=tfar, any_hit=True, interpret=True)[1] >= 0
occ_ref, occ_c = np.asarray(occ_ref), np.asarray(occ_c)
assert (occ_ref == occ_c).all(), np.where(occ_ref != occ_c)
print("any-hit OK:", occ_c.sum(), "occluded")

# dead lanes (t_far = 0)
occ0 = TC.bvh_hit_ts_cull(bvh, ro_j, rd_j, 1e-4, t_far=jnp.zeros((R,)), any_hit=True, interpret=True)[1]
assert (np.asarray(occ0) < 0).all()
print("dead-lane OK")
