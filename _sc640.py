import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
N = 10
def bench(name, fn, *args):
    out = fn(*args); s=float(jnp.sum(out))
    t0=time.perf_counter(); out = fn(*args); s=float(jnp.sum(out))
    print(f"{name:52s} per-op {(time.perf_counter()-t0)/N*1000:7.2f} ms")

def chain_scatter(HW, C, P):
    g = jnp.ones((P, C), jnp.float32)
    idx0 = jnp.asarray(rng.integers(0, HW, P).astype(np.int32))
    @jax.jit
    def f(i0):
        def body(k, acc):
            out = jnp.zeros((HW, C)).at[(i0 + k) % HW].add(g)
            return acc + out[0, 0]
        return jax.lax.fori_loop(0, N, body, jnp.zeros(()))
    return f, idx0

def chain_gather(HW, C, P):
    tab = jnp.asarray(rng.normal(size=(HW, C)).astype(np.float32))
    idx0 = jnp.asarray(rng.integers(0, HW, P).astype(np.int32))
    @jax.jit
    def f(i0):
        def body(k, acc):
            return acc + jnp.sum(jnp.take(tab, (i0 + k) % HW, axis=0))
        return jax.lax.fori_loop(0, N, body, jnp.zeros(()))
    return f, idx0

for (hw, c, p, tag) in [
    (163216, 8, 1900544, "163k x 8, P=1.9M (ref point)"),
    (409600, 32, 1359872, "410k x 32, P=1.36M (640 density)"),
    (409600, 96, 524288, "410k x 96, P=524k (640 app)"),
    (409600, 32, 453632, "410k x 32, P=454k"),
]:
    f, i0 = chain_scatter(hw, c, p)
    bench(f"scatter [{tag}]", f, i0)
f, i0 = chain_gather(409600, 32, 1359872)
bench("gather [410k x 32, P=1.36M]", f, i0)
