"""Diagnose the bench hit_overflow: per-chunk raw hit-interval counts."""
import os
import sys
import time

import numpy as np

import bench
from sahara_tpu.alphabet import D_DNA5
from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.tape import compile_tape
from sahara_tpu.engine.workq import run_workq_search
from sahara_tpu.index.fmindex import load_index, save_index
from sahara_tpu.schemes import GENERATORS, expand

ref, queries = bench.load_workload()
idx_path = os.path.expanduser("~/.cache/sahara_tpu/bench_index40.idx")
if not os.path.exists(idx_path):
    from sahara_tpu.index.build import build_bifmindex

    t0 = time.monotonic()
    host = build_bifmindex([ref], 6, "d_dna5", rate=16)
    print(f"build {time.monotonic() - t0:.1f}s", flush=True)
    save_index(idx_path, host)
else:
    host = load_index(idx_path)
dev = DeviceIndex.from_host(host)
tape = compile_tape(expand(GENERATORS["optimum"].generator(0, 2, 0, 0), 100))

CHUNK = 8192
n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 4
sq = [s for q in queries for s in (q, D_DNA5.reverse_complement_rank(q).astype(np.uint8))]
for ci in range(n_chunks):
    qs = sq[ci * CHUNK : (ci + 1) * CHUNK]
    qarr = np.stack(qs).astype(np.int32)
    t0 = time.monotonic()
    h = run_workq_search(dev, qarr, tape, edit=True, dedup=True, max_retries=8)
    dt = time.monotonic() - t0
    rows = int(h.sz.sum()) if h.n_hits else 0
    print(
        f"chunk {ci}: n_hits={h.n_hits} sa_rows={rows} max_live={h.max_live} "
        f"q_ovf={h.queue_overflow} h_ovf={h.hit_overflow} dt={dt:.2f}s",
        flush=True,
    )
