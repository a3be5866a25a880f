"""Component microbench at the CURRENT bench shapes (cap~28672, e_used=9)."""
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax

CAP = 28672
E = 9
W = 2_500_000
rng = np.random.default_rng(0)
occ = jnp.asarray(rng.integers(0, 2**31, size=(W, 12), dtype=np.int32))
idx2 = jnp.asarray(rng.integers(0, W, size=2*CAP).astype(np.int32))
flags = jnp.asarray(rng.random(CAP*E) < 0.08)
tri = jnp.triu(jnp.ones((512, 512), dtype=jnp.float32))
cand = jnp.arange(CAP*E, dtype=jnp.int32)
dest = jnp.asarray(rng.integers(0, CAP, size=CAP*E).astype(np.int32))
smallidx = jnp.asarray(rng.integers(0, CAP, size=CAP).astype(np.int32))
vec = jnp.asarray(rng.integers(0, 2**30, size=CAP, dtype=np.int32))
pri = jnp.asarray(rng.integers(0, 2**30, size=CAP, dtype=np.int32))
S5 = jnp.asarray(rng.integers(0, 2**30, size=(CAP,5), dtype=np.int32))
P3 = jnp.asarray(rng.integers(0, 2**30, size=(CAP*5,3), dtype=np.int32))
pidx = jnp.asarray(rng.integers(0, CAP*5, size=CAP).astype(np.int32))

def bench(name, fn, *args, reps=50):
    f = jax.jit(fn)
    out = f(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        for _ in range(reps):
            out = f(*args)
        (out[0] if isinstance(out, tuple) else out).block_until_ready()
        best = min(best, (time.monotonic()-t0)/reps)
    print(f"{name:28s} {best*1e3:8.3f} ms   {best/CAP*1e9:6.1f} ns/slot")

def positions(fl):
    f = fl.reshape(-1, 512).astype(jnp.float32)
    incl = jnp.dot(f, tri, preferred_element_type=jnp.float32)
    row_tot = incl[:, -1]
    row_off = jnp.cumsum(row_tot) - row_tot
    pos = (incl - f + row_off[:, None]).astype(jnp.int32).reshape(-1)
    return pos, (row_off[-1] + row_tot[-1]).astype(jnp.int32)

bench("occ_gather_2cap", lambda i: jnp.take(occ, i, axis=0).sum(axis=0), idx2)
bench("positions_9cap", lambda fl: positions(fl)[0], flags)
bench("scatter_9cap", lambda d, c: jnp.zeros(CAP, jnp.int32).at[d].set(c, mode="drop"), dest, cand[:CAP*E])
bench("scatter_min_cap(dedup)", lambda d, c: jnp.full(CAP, 2**31-1, jnp.int32).at[d].min(c), dest[:CAP], pri)
bench("take_word", lambda i: jnp.take(vec, i), smallidx)
bench("take_S5", lambda i: jnp.take(S5, i, axis=0).sum(axis=1), smallidx)
bench("take_P3", lambda i: jnp.take(P3, i, axis=0).sum(axis=1), pidx)
