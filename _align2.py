import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
N = 10
HW, P = 409600, 1359872
tab = jnp.asarray(rng.normal(size=(HW, 128)).astype(np.float32))
idx0 = jnp.asarray(rng.integers(0, HW, P).astype(np.int32))

def bench(name, fn, *args):
    out = fn(*args); s=float(jnp.sum(out))
    t0=time.perf_counter(); out = fn(*args); s=float(jnp.sum(out))
    print(f"{name:56s} per-op {(time.perf_counter()-t0)/N*1000:7.2f} ms")

@jax.jit
def gather_slice(i0):
    def body(k, acc):
        rows = jnp.take(tab, (i0 + k) % HW, axis=0)[:, :32]
        return acc + jnp.sum(rows)
    return jax.lax.fori_loop(0, N, body, jnp.zeros(()))
bench("gather [410k,128] then slice :32", gather_slice, idx0)

# backward analog: scatter of zero-padded [P,128]
g32 = jnp.ones((P, 32), jnp.float32)
@jax.jit
def scatter_pad(i0):
    def body(k, acc):
        g = jnp.pad(g32, ((0, 0), (0, 96)))
        out = jnp.zeros((HW, 128)).at[(i0 + k) % HW].add(g)
        return acc + out[0, 0]
    return jax.lax.fori_loop(0, N, body, jnp.zeros(()))
bench("scatter zero-padded [P,128] -> [410k,128]", scatter_pad, idx0)

# grad through the real pattern
@jax.jit
def grad_pattern(i0):
    def loss(t):
        def body(k, acc):
            rows = jnp.take(t, (i0 + k) % HW, axis=0)[:, :32]
            return acc + jnp.sum(rows**2)
        return jax.lax.fori_loop(0, N, body, jnp.zeros(()))
    return jax.grad(loss)(tab)
bench("grad(take+slice) [410k,128]", grad_pattern, idx0)
