import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
N = 10
HW, C, P = 409600, 32, 1359872

def bench(name, fn, *args):
    out = fn(*args); s=float(jnp.sum(out))
    t0=time.perf_counter(); out = fn(*args); s=float(jnp.sum(out))
    print(f"{name:56s} per-op {(time.perf_counter()-t0)/N*1000:7.2f} ms")

tab128 = jnp.asarray(rng.normal(size=(HW // 4, 128)).astype(np.float32))
idx0 = jnp.asarray(rng.integers(0, HW, P).astype(np.int32))

@jax.jit
def gather_packed(i0):
    def body(k, acc):
        idx = (i0 + k) % HW
        rows = jnp.take(tab128, idx >> 2, axis=0)          # [P,128]
        rows = rows.reshape(-1, 4, 32)
        sel = jnp.take_along_axis(rows, (idx & 3)[:, None, None], axis=1)[:, 0]
        return acc + jnp.sum(sel)
    return jax.lax.fori_loop(0, N, body, jnp.zeros(()))
bench("gather packed [102k,128] +select, P=1.36M", gather_packed, idx0)

g = jnp.ones((P, 32), jnp.float32)
@jax.jit
def scatter_packed(i0):
    def body(k, acc):
        idx = (i0 + k) % HW
        rows = jnp.zeros((P, 4, 32)).at[jnp.arange(P), idx & 3].set(g)
        out = jnp.zeros((HW // 4, 128)).at[idx >> 2].add(rows.reshape(-1, 128))
        return acc + out[0, 0]
    return jax.lax.fori_loop(0, N, body, jnp.zeros(()))
bench("scatter packed [102k,128], P=1.36M", scatter_packed, idx0)

# control: is it table bytes or row alignment? [410k,128] full size
tab_big = jnp.asarray(rng.normal(size=(HW, 128)).astype(np.float32))
@jax.jit
def gather_big(i0):
    def body(k, acc):
        return acc + jnp.sum(jnp.take(tab_big, (i0 + k) % HW, axis=0))
    return jax.lax.fori_loop(0, N, body, jnp.zeros(()))
bench("gather [410k,128] P=1.36M", gather_big, idx0)
g128 = jnp.ones((P, 128), jnp.float32)
@jax.jit
def scatter_big(i0):
    def body(k, acc):
        out = jnp.zeros((HW, 128)).at[(i0 + k) % HW].add(g128)
        return acc + out[0, 0]
    return jax.lax.fori_loop(0, N, body, jnp.zeros(()))
bench("scatter [410k,128] P=1.36M", scatter_big, idx0)
