import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

def bench(label, fn, flops=None, bts=None, n=10):
    out = jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn())
    dt = (time.time() - t0) / n
    extra = ""
    if flops: extra += f" {flops/dt/1e12:7.2f} TFLOP/s"
    if bts: extra += f" {bts/dt/1e9:7.1f} GB/s"
    print(f"{label:40s} {dt*1e3:9.3f} ms{extra}")

k = jax.random.PRNGKey(0)
a = jax.block_until_ready(jax.random.normal(k, (8192, 8192), jnp.bfloat16))
@jax.jit
def mm(a):
    return a @ a
bench("matmul 8192^3 bf16", lambda: mm(a), flops=2 * 8192**3)

af = jax.block_until_ready(jax.random.normal(k, (4096, 4096), jnp.float32))
@jax.jit
def mmf(a):
    return a @ a
bench("matmul 4096^3 f32", lambda: mmf(af), flops=2 * 4096**3)

x = jax.block_until_ready(jax.random.normal(k, (65536, 640), jnp.float32))
@jax.jit
def ew(x):
    y = x
    for _ in range(20):
        y = y * 1.0001 + 0.1
    return y
bench("elementwise 40 ops (65536,640)", lambda: ew(x), flops=40 * x.size,
      bts=2 * 4 * x.size)

@jax.jit
def copy(x):
    return x + 1.0
bench("copy+1 (65536,640) 167MB rw", lambda: copy(x), bts=2 * 4 * x.size)

big = jax.block_until_ready(jax.random.normal(k, (8192, 8192), jnp.float32))
@jax.jit
def copy2(x):
    return x + 1.0
bench("copy+1 (8192,8192) 268MB rw", lambda: copy2(big), bts=2 * 4 * big.size)
