"""Microbenchmark the engine step's component ops at bench sizes."""
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax

CAP = 65536
E = 16
W = 2_500_000  # 40MB bidir occ rows
rng = np.random.default_rng(0)
occ = jnp.asarray(rng.integers(0, 2**31, size=(W, 12), dtype=np.int32))
idx2 = jnp.asarray(rng.integers(0, W, size=2*CAP).astype(np.int32))
flags = jnp.asarray(rng.random(CAP*E) < 0.04)
tri = jnp.triu(jnp.ones((512, 512), dtype=jnp.float32))
cand = jnp.arange(CAP*E, dtype=jnp.int32)
dest = jnp.asarray(rng.integers(0, CAP, size=CAP*E).astype(np.int32))
smallidx = jnp.asarray(rng.integers(0, CAP, size=CAP).astype(np.int32))
vec = jnp.asarray(rng.integers(0, 2**30, size=CAP, dtype=np.int32))
pri = jnp.asarray(rng.integers(0, 2**30, size=CAP, dtype=np.int32))

def bench(name, fn, *args, reps=30):
    f = jax.jit(fn)
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else f(*args).block_until_ready()
    t0 = time.monotonic()
    for _ in range(reps):
        out = f(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    print(f"{name:28s} {(time.monotonic()-t0)/reps*1e3:8.3f} ms")

bench("occ_gather_2cap_rows", lambda i: jnp.take(occ, i, axis=0).sum(axis=0), idx2)
def positions(fl):
    f = fl.reshape(-1, 512).astype(jnp.float32)
    incl = jnp.dot(f, tri, preferred_element_type=jnp.float32)
    row_tot = incl[:, -1]
    row_off = jnp.cumsum(row_tot) - row_tot
    pos = (incl - f + row_off[:, None]).astype(jnp.int32).reshape(-1)
    return pos, (row_off[-1] + row_tot[-1]).astype(jnp.int32)
bench("positions_16cap", lambda fl: positions(fl)[0], flags)
bench("positions_cap", lambda fl: positions(fl)[0], flags[:CAP])
bench("scatter_16cap_to_cap", lambda d, c: jnp.zeros(CAP, jnp.int32).at[d].set(c, mode="drop"), dest, cand)
bench("scatter_cap_to_cap", lambda d, c: jnp.zeros(CAP, jnp.int32).at[d].set(c, mode="drop"), dest[:CAP], cand[:CAP])
bench("scatter_min_cap", lambda d, c: jnp.full(CAP, 2**31-1, jnp.int32).at[d].min(c), dest[:CAP], pri)
bench("scatter_add_cap", lambda d: jnp.zeros(CAP, jnp.int32).at[d].add(1, mode="drop"), dest[:CAP])
bench("take_int_cap", lambda i: jnp.take(vec, i), smallidx)
bench("take6_int_cap", lambda i: sum(jnp.take(vec, i+j) for j in range(6)), smallidx)
bench("flags_build", lambda e: jnp.concatenate([ (e[:,None] > jnp.arange(5)[None,:]), (e[:,None] > jnp.arange(5)[None,:]), (e[:,None]>0)[:,None], jnp.zeros((CAP,5),bool)], axis=1).reshape(-1), vec)
