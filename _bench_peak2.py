import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

def bench(label, fn, flops=None, bts=None, n=5):
    out = np.asarray(fn())  # compile + settle
    t0 = time.time()
    for _ in range(n):
        out = np.asarray(fn())
    dt = (time.time() - t0) / n
    extra = ""
    if flops: extra += f" {flops/dt/1e12:7.2f} TFLOP/s"
    if bts: extra += f" {bts/dt/1e9:7.1f} GB/s"
    print(f"{label:44s} {dt*1e3:9.3f} ms{extra}")

k = jax.random.PRNGKey(0)

@jax.jit
def nopf(x):
    return x + 1.0
xs = jnp.zeros((1, 1))
bench("roundtrip floor (tiny)", lambda: nopf(xs))

a = jax.random.normal(k, (8192, 8192), jnp.bfloat16)
@jax.jit
def mm(a):
    return (a @ a).sum()
bench("matmul 8192^3 bf16 -> scalar", lambda: mm(a), flops=2 * 8192**3)

af = jax.random.normal(k, (4096, 4096), jnp.float32)
@jax.jit
def mmf(a):
    return (a @ a).sum()
bench("matmul 4096^3 f32 -> scalar", lambda: mmf(af), flops=2 * 4096**3)

x = jax.random.normal(k, (65536, 640), jnp.float32)
@jax.jit
def ew(x):
    y = x
    for _ in range(40):
        y = y * 1.0001 + 0.1
    return y.sum()
bench("elementwise 80 flops (65536,640)", lambda: ew(x), flops=80 * x.size)

big = jax.random.normal(k, (8192, 8192), jnp.float32)
@jax.jit
def copy2(x):
    return (x + 1.0).sum()  # read 268MB + reduce
bench("read+reduce (8192,8192) 268MB", lambda: copy2(big), bts=4 * big.size)

# divides (used heavily in sweeps)
@jax.jit
def dv(x):
    return (1.0 / (x + 2.0) + 1.0 / (x + 3.0)).sum()
bench("2 divides (65536,640)", lambda: dv(x), flops=2 * x.size)
