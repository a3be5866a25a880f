import os
os.environ["JAX_PLATFORMS"]="cpu"
os.environ["SAHARA_CAPMEM_PATH"]="/tmp/capmem_dbg2.json"
import numpy as np
from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.driver import search_queries
from sahara_tpu.index.build import build_bifmindex

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
res = search_queries(dev, queries, k=1, generator_name="backtracking", edit=False)
print("rows", len(res.query_id), set(zip(res.query_id.tolist(), res.seq_id.tolist(), res.pos.tolist())))
