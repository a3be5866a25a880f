import os
os.environ["JAX_PLATFORMS"]="cpu"
os.environ["SAHARA_CAPMEM_PATH"]="/tmp/capmem_dbg3.json"
import numpy as np
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
for dedup in (True, False):
    h = run_workq_search(dev, qarr, tape, edit=False, dedup=dedup)
    print("dedup", dedup, "hits", h.n_hits, "profile", h.live_profile.tolist())

import os as _o
print("--- packed off ---")
h = run_workq_search(dev, qarr, tape, edit=False, dedup=False, packed=False)
print("hits", h.n_hits, "profile", h.live_profile.tolist())
print("--- edit=True same data ---")
ess2 = expand(GENERATORS["backtracking"].generator(0, 1, 0, 0), m)
tape2 = compile_tape(ess2)
h = run_workq_search(dev, qarr, tape2, edit=True, dedup=False)
print("hits", h.n_hits, "profile", h.live_profile.tolist())
