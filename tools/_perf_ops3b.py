import numpy as np, time, jax, jax.numpy as jnp
from jax import lax

CAP = 28672
E = 9
rng = np.random.default_rng(0)
dest = jnp.asarray(rng.integers(0, CAP, size=CAP*E).astype(np.int32))
smallidx = jnp.asarray(rng.integers(0, CAP, size=CAP).astype(np.int32))
vec = jnp.asarray(rng.integers(1, 2**20, size=CAP, dtype=np.int32))
S5 = jnp.asarray(rng.integers(0, 2**20, size=(CAP,5), dtype=np.int32))
P3 = jnp.asarray(rng.integers(0, 2**20, size=(CAP*5,3), dtype=np.int32))
pidx = jnp.asarray(rng.integers(0, CAP*5, size=CAP).astype(np.int32))

def scan_op(op, carry0, L):
    @jax.jit
    def run():
        def body(c, _):
            return op(c), None
        c, _ = lax.scan(body, carry0, None, length=L)
        return c
    return run

def slope(name, op, carry0, l1=8, l2=72):
    f1, f2 = scan_op(op, carry0, l1), scan_op(op, carry0, l2)
    for f in (f1, f2):
        jax.tree.map(lambda x: x.block_until_ready(), f())
    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.monotonic()
            for _ in range(8):
                out = f()
            jax.tree.map(lambda x: x.block_until_ready(), out)
            best = min(best, (time.monotonic()-t0)/8)
        return best
    per = (t(f2) - t(f1)) / (l2 - l1)
    print(f"{name:30s} {per*1e6:8.1f} us/step  {per/CAP*1e9:6.1f} ns/slot")

slope("scatter_9cap_to_cap", lambda c: jnp.tile(jnp.zeros(CAP, jnp.int32).at[(dest + c) & (CAP - 1)].set(c, mode="drop"), E), jnp.zeros(CAP*E, jnp.int32))
slope("scatter_cap_to_cap", lambda c: jnp.zeros(CAP, jnp.int32).at[(dest[:CAP] + c) & (CAP - 1)].set(c, mode="drop"), jnp.zeros(CAP, jnp.int32))
slope("dedup_min+take", lambda c: jnp.take(jnp.full(CAP, 2**31-1, jnp.int32).at[(c + dest[:CAP]) & (CAP-1)].min(c), smallidx), vec)
slope("take_word", lambda c: jnp.take(vec, (c + smallidx) & (CAP-1)) + c*0, vec)
slope("take_S5_row", lambda c: jnp.take(S5, (c + smallidx) & (CAP-1), axis=0).sum(axis=1) + c*0, vec)
slope("take_P3_row", lambda c: jnp.take(P3, ((c + pidx) % (CAP*5)), axis=0).sum(axis=1) + c*0, vec)
def flagmath(c):
    err = c & 7
    e_ms = err[:, None] + (c[:, None] != jnp.arange(1, 5)[None, :])
    ok = (e_ms <= 2) & (e_ms >= 0) & (c[:, None] > 0)
    return c + ok.sum(axis=1)
slope("flags_elementwise", flagmath, vec)
