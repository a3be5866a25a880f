import os
os.environ["JAX_PLATFORMS"]="cpu"
os.environ["SAHARA_CAPMEM_PATH"]="/tmp/capmem_dbg4.json"
import numpy as np, jax, jax.numpy as jnp
import sahara_tpu.engine.workq as W

DUMPS = []
orig = W._compact_matmul
def spy(fl, payload, cap, tri):
    def rec(f, p):
        DUMPS.append((np.asarray(f).copy(), np.asarray(p).copy()))
    jax.debug.callback(rec, fl, payload)
    return orig(fl, payload, cap, tri)
W._compact_matmul = spy

from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.tape import compile_tape
from sahara_tpu.engine.workq import run_workq_search
from sahara_tpu.index.build import build_bifmindex
from sahara_tpu.schemes import GENERATORS, expand, limit_to_hamming

rng = np.random.default_rng(7)
seqs = [rng.integers(1, 5, size=ln).astype(np.uint8) for ln in (300, 150, 80)]
host = build_bifmindex(seqs, 6, "d_dna5", rate=16)
dev = DeviceIndex.from_host(host)
def _mutate(rng, q, n_sub):
    q = q.copy()
    pos = rng.choice(len(q), size=n_sub, replace=False)
    for p in pos:
        q[p] = 1 + (q[p] - 1 + rng.integers(1, 4)) % 4
    return q
rng = np.random.default_rng(1 * 31 + 5)
m = 20
qs = []
for _ in range(6):
    s = seqs[rng.integers(0, len(seqs))]
    p = rng.integers(0, len(s) - m + 1)
    qs.append(s[p : p + m].copy())
queries = [_mutate(rng, q, j % 2) for j, q in enumerate(qs)]
qarr = np.stack(queries).astype(np.int32)
ess = limit_to_hamming(expand(GENERATORS["backtracking"].generator(0, 1, 0, 0), m))
tape = compile_tape(ess)
h = run_workq_search(dev, qarr, tape, edit=False, dedup=False)
print("hits", h.n_hits, "dumps", len(DUMPS))

# offline: compare mm vs scatter on each dumped (fl, payload)
tri = jnp.triu(jnp.ones((512,512), jnp.float32))
CAP = 512
mm = jax.jit(lambda f,p: orig(f,p,CAP,tri))
def sc(f,p):
    pos,tot = W._positions(f,tri)
    dest = jnp.where(f,pos,CAP)
    return jnp.zeros(CAP,jnp.int32).at[dest].set(p,mode="drop"), tot
scj = jax.jit(sc)
for i,(f,p) in enumerate(DUMPS):
    a,ta = mm(jnp.asarray(f), jnp.asarray(p))
    b,tb = scj(jnp.asarray(f), jnp.asarray(p))
    t=min(int(ta),CAP)
    same = int(ta)==int(tb) and (np.asarray(a[:t])==np.asarray(b[:t])).all()
    if not same:
        print(f"step {i}: MISMATCH tot {int(ta)} vs {int(tb)}")
        np.save(f"/tmp/badfl_{i}.npy", f); np.save(f"/tmp/badpay_{i}.npy", p)
    else:
        print(f"step {i}: ok tot={int(ta)} setflags={int(f.sum())}")
