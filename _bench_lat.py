import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

x = jax.block_until_ready(jnp.ones((8, 128)))

@jax.jit
def f(x):
    return x + 1.0

def bench(label, fn, n=30):
    out = jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn())
    dt = (time.time() - t0) / n
    print(f"{label:40s} {dt*1e3:9.3f} ms")

bench("trivial jit x+1 (8,128)", lambda: f(x))

y = jax.block_until_ready(jnp.ones((4096, 4096)))
@jax.jit
def g(y):
    return y @ y
bench("matmul 4096^2", lambda: g(y))

# chained without sync: 10 dispatches, one block
@jax.jit
def f10(x):
    for _ in range(10):
        x = x + 1.0
    return x
bench("trivial jit 10 adds fused", lambda: f10(x))

def chain10():
    z = x
    for _ in range(10):
        z = f(z)
    return z
bench("10 separate jit dispatches, 1 sync", chain10)
