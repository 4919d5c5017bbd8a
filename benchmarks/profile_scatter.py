"""A/B the parameter-gradient scatter-add strategies on the real chip.

The r5 gradient roofline (BASELINE.md) names the VJP's scatter-adds as
the binding resource of the fwd+bwd step: d/d(vertices) scatters ~524k
(bounce, ray) contributions into the 69k-vertex tables (~38 ms measured
in situ). XLA lowers ``zeros.at[idx].add(v)`` on TPU as a serialized
scatter. Candidate replacements measured here, shapes matched to the
bench grad config (R=65536, 8 bounces, bunny 69451 verts, 3 channels):

A. plain ``.at[idx].add(v)``              — the status quo
B. sort by idx + cumsum + unique scatter  — segment totals by cumsum
   difference at segment ends; final scatter has unique indices
C. jax.ops.segment_sum on sorted ids      — library path for comparison
D. one-shot sort_key_val on packed f32x3  — B but sorting values along

Run: JAX_PLATFORMS=<tpu> python benchmarks/profile_scatter.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 65536 * 8
N = 69451
C = 3

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, N, size=(K,)), jnp.int32)
val = jnp.asarray(rng.standard_normal((K, C)), jnp.float32)


@jax.jit
def method_a(idx, val):
    return jnp.zeros((N, C), jnp.float32).at[idx].add(val)


@jax.jit
def method_b(idx, val):
    order = jnp.argsort(idx)
    si = idx[order]
    sv = val[order]
    cs = jnp.cumsum(sv, axis=0)
    is_end = jnp.concatenate([si[1:] != si[:-1], jnp.ones((1,), bool)])
    # segment total at each end = cs[end] - cs[previous end]; realize via
    # scatter of cs at ends (unique) then gather-shift by segment rank
    out = jnp.zeros((N + 1, C), jnp.float32)
    out = out.at[jnp.where(is_end, si, N)].set(
        cs, mode="drop", unique_indices=True)
    # running totals at ends are inclusive-prefix; subtract the previous
    # segment's inclusive prefix = cumulative table of out itself
    tot = out[:N]
    prev = jnp.concatenate(
        [jnp.zeros((1, C)), jnp.cumsum(tot, axis=0)[:-1]], axis=0)
    return tot - jnp.where(tot.any(axis=1, keepdims=True), prev, 0)


@jax.jit
def method_b2(idx, val):
    # simpler exact variant: scatter inclusive-prefix at ends, then
    # recover per-segment totals by differencing consecutive NONZERO
    # rows — done by a second cumsum-free pass: gather the prefix at the
    # previous segment end via a max-scan over (si, position).
    order = jnp.argsort(idx)
    si = idx[order]
    sv = val[order]
    cs = jnp.cumsum(sv, axis=0)
    is_end = jnp.concatenate([si[1:] != si[:-1], jnp.ones((1,), bool)])
    is_start = jnp.concatenate([jnp.ones((1,), bool), si[1:] != si[:-1]])
    # prefix before this segment = cs at (start-1), 0 for the first row
    start_pos = jnp.where(is_end, jnp.cumsum(is_start) - 1, 0)
    # position of each segment's first element, indexed per end
    starts = jnp.nonzero(is_start, size=K, fill_value=K - 1)[0]
    seg_first = starts[jnp.clip(start_pos, 0, K - 1)]
    before = jnp.where((seg_first > 0)[:, None], cs[jnp.maximum(seg_first - 1, 0)], 0.0)
    seg_tot = cs - before
    return jnp.zeros((N, C), jnp.float32).at[
        jnp.where(is_end, si, N)].set(seg_tot, mode="drop",
                                      unique_indices=True)


@jax.jit
def method_c(idx, val):
    order = jnp.argsort(idx)
    return jax.ops.segment_sum(val[order], idx[order], num_segments=N,
                               indices_are_sorted=True)


@jax.jit
def method_d(idx, val):
    si, o = jax.lax.sort_key_val(idx, jnp.arange(K, dtype=jnp.int32))
    sv = val[o]
    return jax.ops.segment_sum(sv, si, num_segments=N,
                               indices_are_sorted=True)


def bench(name, f):
    out = jax.block_until_ready(f(idx, val))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(idx, val))
        ts.append(time.perf_counter() - t0)
    ref = np.zeros((N, C), np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(val))
    err = float(np.abs(np.asarray(out) - ref).max())
    print(f"{name}: {min(ts)*1e3:8.2f} ms   max_abs_err={err:.3e}")
    return min(ts)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    bench("A at[].add          ", method_a)
    bench("C sort+segment_sum  ", method_c)
    bench("D sortkv+segment_sum", method_d)
    try:
        bench("B2 cumsum-diff      ", method_b2)
    except Exception as e:
        print(f"B2 failed: {e}")
