import jax, jax.numpy as jnp, numpy as np, time
from jax import lax
dev = jax.devices()[0]
base = 0
W = 2_500_000
rng = np.random.default_rng(0)
occ12 = jax.device_put(rng.integers(0, 2**31, size=(W, 12), dtype=np.int32))
print("occ[W,12] logical MB:", occ12.nbytes/1e6, "device MB:", -1)
base2 = 0
occ16 = jax.device_put(rng.integers(0, 2**31, size=(W, 16), dtype=np.int32))
print("occ[W,16] logical MB:", occ16.nbytes/1e6, "device MB:", -1)
base3 = 0
occ128 = jax.device_put(rng.integers(0, 2**31, size=(W//8, 96), dtype=np.int32))
print("occ[W/8,96] logical MB:", occ128.nbytes/1e6, "device MB:", -1)

idx = jnp.asarray(rng.integers(0, W, size=57344).astype(np.int32))
def scan_op(op, carry0, L):
    @jax.jit
    def run():
        def body(c, _):
            return op(c), None
        return lax.scan(body, carry0, None, length=L)[0]
    return run
def slope(name, op, carry0, l1=8, l2=72):
    f1, f2 = scan_op(op, carry0, l1), scan_op(op, carry0, l2)
    for f in (f1, f2): f().block_until_ready()
    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.monotonic()
            for _ in range(8): out = f()
            out.block_until_ready()
            best = min(best, (time.monotonic()-t0)/8)
        return best
    per = (t(f2)-t(f1))/(l2-l1)
    print(f"{name:26s} {per*1e6:8.1f} us/step  {per/57344*1e9:5.1f} ns/row")
slope("take_rows_[W,12]", lambda c: jnp.take(occ12, (c>>5)%W, axis=0).sum(axis=1).astype(jnp.int32)+c*0+1, idx)
slope("take_rows_[W,16]", lambda c: jnp.take(occ16, (c>>5)%W, axis=0).sum(axis=1).astype(jnp.int32)+c*0+1, idx)
# folded: 8 rows per [96] vector row, select by one-hot — gathers W/8-row table
def folded(c):
    r = jnp.take(occ128, ((c>>5)%W)>>3, axis=0)  # [n, 96]
    return r.sum(axis=1).astype(jnp.int32)+c*0+1
slope("take_rows_folded[W/8,96]", folded, idx)
