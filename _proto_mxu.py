"""Prototype: MXU leaf sweep with HBM-streamed per-leaf coefficient blocks."""
import os, time, functools, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.4e38
LANE = 128


def build_bmat(planes):
    """(12, M, 128) coefficient planes -> (M, 8, 768) MXU blocks."""
    M = planes.shape[1]
    b = np.zeros((M, 8, 6 * LANE), np.float32)
    p = np.asarray(planes)
    for f in range(3):                      # o_u, o_v, o_w <- rows 4f..4f+3
        b[:, 0:4, f * LANE:(f + 1) * LANE] = p[4 * f:4 * f + 4].transpose(1, 0, 2)
    for f in range(3):                      # d_u, d_v, d_w <- rows 4f..4f+2
        b[:, 4:7, (3 + f) * LANE:(4 + f) * LANE] = p[4 * f:4 * f + 3].transpose(1, 0, 2)
    return b


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tfar_ref,
            list_ref, count_ref, bmat_ref,
            t_out_ref, slot_out_ref,
            buf_ref, sem_ref,
            *, t_min: float, any_hit: bool, sub: int):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tfar = tfar_ref[:]
    count = count_ref[0, 0, 0]
    R = sub * LANE

    one = jnp.ones_like(ox)
    zero = jnp.zeros_like(ox)
    A = jnp.concatenate(
        [c.reshape(R, 1) for c in (ox, oy, oz, one, dx, dy, dz, zero)], axis=1)

    def dma(i, slot):
        return pltpu.make_async_copy(
            bmat_ref.at[list_ref[0, 0, i]], buf_ref.at[slot], sem_ref.at[slot])

    @pl.when(count > 0)
    def _():
        dma(0, 0).start()

    def body(carry):
        i, best_t, best_i = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < count)
        def _():
            dma(i + 1, 1 - slot).start()

        dma(i, slot).wait()
        leaf = list_ref[0, 0, i]
        F = jnp.dot(A, buf_ref[slot], preferred_element_type=jnp.float32)
        F = F.reshape(sub, LANE, 6 * LANE)
        o_u = F[:, :, 0 * LANE:1 * LANE]
        o_v = F[:, :, 1 * LANE:2 * LANE]
        o_w = F[:, :, 2 * LANE:3 * LANE]
        d_u = F[:, :, 3 * LANE:4 * LANE]
        d_v = F[:, :, 4 * LANE:5 * LANE]
        d_w = F[:, :, 5 * LANE:6 * LANE]
        ok_w = jnp.abs(d_w) > 1e-12
        t = -o_w / jnp.where(ok_w, d_w, 1.0)
        u = o_u + t * d_u
        v = o_v + t * d_v
        ok = (ok_w & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= t_min) & (t < best_t[:, :, None]))
        t = jnp.where(ok, t, INF)
        tmin = t.min(-1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 2)
        lane = jnp.min(jnp.where(t <= tmin[:, :, None], lane_iota, 1 << 30), -1)
        better = tmin < best_t
        best_i = jnp.where(better, leaf * LANE + lane, best_i)
        best_t = jnp.where(better, tmin, best_t)
        if any_hit:
            best_t = jnp.where(best_i >= 0, t_min, best_t)
        return i + 1, best_t, best_i

    init = (jnp.int32(0), tfar, jnp.full(ox.shape, -1, jnp.int32))
    if any_hit:
        def cond(c):
            return (c[0] < count) & jnp.any((c[2] < 0) & (tfar > t_min))
    else:
        def cond(c):
            return c[0] < count
    _, best_t, best_i = jax.lax.while_loop(cond, body, init)
    t_out_ref[:] = best_t
    slot_out_ref[:] = best_i


@functools.partial(jax.jit, static_argnames=("t_min", "sub", "any_hit", "interpret"))
def sweep_mxu(planes7, lists, counts, bmat, *, t_min, sub, any_hit=False,
              interpret=False):
    nb = planes7[0].shape[0] // sub
    L = lists.shape[-1]
    lists = lists.reshape(nb, 1, L)
    counts = counts.reshape(nb, 1, 1)

    ray_spec = pl.BlockSpec((sub, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    list_spec = pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    count_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    bmat_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    kernel = functools.partial(_kernel, t_min=t_min, any_hit=any_hit, sub=sub)
    t, slot = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[ray_spec] * 7 + [list_spec, count_spec, bmat_spec],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct(planes7[0].shape, jnp.float32),
            jax.ShapeDtypeStruct(planes7[0].shape, jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, 6 * LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*planes7, lists, counts, bmat)
    return t, slot


if __name__ == "__main__":
    on_cpu = "cpu" in os.environ.get("JAX_PLATFORMS", "")
    from offline_raytracer_tpu.ops.bvh import build_tri_bvh
    from offline_raytracer_tpu.ops import traverse as T
    from offline_raytracer_tpu.ops import traverse_cull as TC

    rng = np.random.default_rng(0)
    N = 700
    c = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    v0 = c
    v1 = c + rng.normal(0, 0.08, (N, 3)).astype(np.float32)
    v2 = c + rng.normal(0, 0.08, (N, 3)).astype(np.float32)
    bvh = build_tri_bvh(v0, v1, v2, np.zeros(N, np.int32))
    bmat = jnp.asarray(build_bmat(bvh.planes))

    R = 1024
    ro = jnp.asarray(rng.uniform(-3, 3, (R, 3)).astype(np.float32))
    rd = rng.normal(0, 1, (R, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    sub = 8
    tb = jnp.full((R,), INF)
    lists, counts = TC.block_leaf_lists(bvh, ro, rd, tb, sub * LANE)
    planes7 = tuple(p.reshape(R // LANE, LANE) for p in
                    (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2], tb))
    t_m, s_m = sweep_mxu(planes7, lists, counts, bmat, t_min=1e-4, sub=sub,
                         interpret=on_cpu)
    t_m = np.asarray(t_m).reshape(-1)
    s_m = np.asarray(s_m).reshape(-1)

    t_ref, s_ref = T.bvh_hit_ts(bvh, ro, rd, 1e-4)
    t_ref, s_ref = np.asarray(t_ref), np.asarray(s_ref)
    hit_m = s_m >= 0
    hit_r = s_ref >= 0
    assert (hit_m == hit_r).all(), (hit_m.sum(), hit_r.sum())
    m = hit_r
    assert np.allclose(t_ref[m], t_m[m], rtol=2e-5, atol=1e-6), np.abs(t_ref[m] - t_m[m]).max()
    print("MXU sweep parity OK:", m.sum(), "hits /", R)

    # debug marginal diff
    d = np.where(hit_m != hit_r)[0]
    for i in d:
        print("ray", i, "ref slot", s_ref[i], "t", t_ref[i], "mxu slot", s_m[i])
        # recompute u,v for ref slot
        import numpy as onp
        p = onp.asarray(bvh.planes)
        sl = s_ref[i] if s_ref[i] >= 0 else s_m[i]
        leaf, lane = divmod(sl, 128)
        co = p[:, leaf, lane]
        o = onp.asarray(ro)[i]; dd = onp.asarray(rd)[i]
        o_u = co[0]*o[0]+co[1]*o[1]+co[2]*o[2]+co[3]
        o_v = co[4]*o[0]+co[5]*o[1]+co[6]*o[2]+co[7]
        o_w = co[8]*o[0]+co[9]*o[1]+co[10]*o[2]+co[11]
        d_u = co[0]*dd[0]+co[1]*dd[1]+co[2]*dd[2]
        d_v = co[4]*dd[0]+co[5]*dd[1]+co[6]*dd[2]
        d_w = co[8]*dd[0]+co[9]*dd[1]+co[10]*dd[2]
        t = -o_w/d_w; u = o_u+t*d_u; v = o_v+t*d_v
        print("   t", t, "u", u, "v", v, "u+v", u+v)
