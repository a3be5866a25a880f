import os
os.environ["JAX_PLATFORMS"]="cpu"
os.environ["SAHARA_CAPMEM_PATH"]="/tmp/capmem_dbg.json"
import numpy as np
from tests.test_approx import _make_queries, _mutate
from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.tape import compile_tape
from sahara_tpu.engine.workq import run_workq_search
from sahara_tpu.index.build import build_bifmindex
from sahara_tpu.schemes import GENERATORS, expand, limit_to_hamming

rng = np.random.default_rng(36)
seqs = [rng.integers(1, 5, size=n).astype(np.uint8) for n in (200, 180, 160)]
host = build_bifmindex(seqs, 6, "d_dna5", rate=16)
dev = DeviceIndex.from_host(host)
rng = np.random.default_rng(1 * 31 + 5)
m = 20
queries = _make_queries(rng, seqs, m, 6)
queries = [_mutate(rng, q, j % 2) for j, q in enumerate(queries)]
qarr = np.stack(queries).astype(np.int32)
ess = limit_to_hamming(expand(GENERATORS["backtracking"].generator(0, 1, 0, 0), m))
tape = compile_tape(ess)
h = run_workq_search(dev, qarr, tape, edit=False, dedup=True)
print("ns", tape.num_searches, "ph0:", end=" ")
from sahara_tpu.engine.workq import phase0_length
print(phase0_length(tape, False))
print("hits", h.n_hits, "profile", h.live_profile.tolist())
