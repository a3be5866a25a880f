"""In-program per-op cost: scan-of-op slope between two lengths cancels
dispatch fixed cost. Shapes = current bench plan (cap=28672, e_used=9)."""
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax
from functools import partial

CAP = 28672
E = 9
W = 2_500_000
rng = np.random.default_rng(0)
occ = jnp.asarray(rng.integers(0, 2**31, size=(W, 12), dtype=np.int32))
tri = jnp.triu(jnp.ones((512, 512), dtype=jnp.float32))
dest = jnp.asarray(rng.integers(0, CAP, size=CAP*E).astype(np.int32))
smallidx = jnp.asarray(rng.integers(0, CAP, size=CAP).astype(np.int32))
vec = jnp.asarray(rng.integers(1, 2**20, size=CAP, dtype=np.int32))
S5 = jnp.asarray(rng.integers(0, 2**20, size=(CAP,5), dtype=np.int32))
P3 = jnp.asarray(rng.integers(0, 2**20, size=(CAP*5,3), dtype=np.int32))
pidx = jnp.asarray(rng.integers(0, CAP*5, size=CAP).astype(np.int32))
idx2 = jnp.asarray(rng.integers(0, W*32, size=2*CAP).astype(np.int32))
flags0 = jnp.asarray((rng.random(CAP*E) < 0.08))

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

# 1. occ gather (2*CAP rows of [12])
slope("occ_gather_2cap_rows", lambda c: (jnp.take(occ, (c >> 5) % W, axis=0).sum(axis=1) + 1).astype(jnp.int32), idx2)
# 2. positions (MXU prefix over 9*CAP flags)
def pos_op(c):
    fl = c > 0
    f = fl.reshape(-1, 512).astype(jnp.float32)
    incl = jnp.dot(f, tri, preferred_element_type=jnp.float32)
    row_tot = incl[:, -1]
    row_off = jnp.cumsum(row_tot) - row_tot
    pos = (incl - f + row_off[:, None]).astype(jnp.int32).reshape(-1)
    return c + pos
slope("positions_9cap", pos_op, jnp.asarray(flags0, jnp.int32))
# 3. candidate scatter 9*CAP sources -> CAP
slope("scatter_9cap", lambda c: jnp.zeros(CAP, jnp.int32).at[dest + (c[0]&1)].set(c[:CAP], mode="drop") + c[:CAP*E]*0 + jnp.concatenate([c, jnp.zeros(CAP*(E-1), jnp.int32)])*0, jnp.ones(CAP*E, jnp.int32))
# 4. dedup scatter-min + table take
slope("dedup_scatter_min+take", lambda c: jnp.take(jnp.full(CAP, 2**31-1, jnp.int32).at[(c + dest[:CAP]) & (CAP-1)].min(c), smallidx), vec)
# 5. flat take
slope("take_word", lambda c: jnp.take(vec, (c + smallidx) & (CAP-1)) + c*0, vec)
# 6. S5 row gather
slope("take_S5_row", lambda c: jnp.take(S5, (c + smallidx) & (CAP-1), axis=0).sum(axis=1) + c*0, vec)
# 7. P3 row gather
slope("take_P3_row", lambda c: jnp.take(P3, ((c + pidx) % (CAP*5)), axis=0).sum(axis=1) + c*0, vec)
# 8. elementwise block (flags math approximation)
def flagmath(c):
    err = c & 7
    e_ms = err[:, None] + (c[:, None] != jnp.arange(1, 5)[None, :])
    ok = (e_ms <= 2) & (e_ms >= 0) & (c[:, None] > 0)
    return c + ok.sum(axis=1)
slope("flags_elementwise", flagmath, vec)
