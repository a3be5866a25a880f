"""Bisect the flat-plan miscompile: same chunk, growing queue caps."""
import os
import sys
import time

import numpy as np

import bench
from sahara_tpu.alphabet import D_DNA5
from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.tape import compile_tape
from sahara_tpu.engine.workq import main_tail_steps, phase0_length, upload_tape, workq_search
from sahara_tpu.index.fmindex import load_index
from sahara_tpu.schemes import GENERATORS, expand

ref, queries = bench.load_workload()
host = load_index(os.path.expanduser("~/.cache/sahara_tpu/bench_index40.idx"))
dev = DeviceIndex.from_host(host)
tape = compile_tape(expand(GENERATORS["optimum"].generator(0, 2, 0, 0), 100))
dt_dev = upload_tape(tape)

CHUNK = 8192
sq = [s for q in queries[: CHUNK // 2] for s in (q, D_DNA5.reverse_complement_rank(q).astype(np.uint8))]
qarr = np.stack(sq).astype(np.int32)
m, ns, k = tape.length, tape.num_searches, tape.max_errors
ph0 = phase0_length(tape, True)
main_steps, tail_steps = main_tail_steps(m, ph0, k, True)
print(f"m={m} ns={ns} k={k} ph0={ph0} main={main_steps} tail={tail_steps}", flush=True)

import jax.numpy as jnp

qj = jnp.asarray(qarr)
act = jnp.ones(qarr.shape[0], dtype=bool)

caps = [int(c) for c in sys.argv[1:]] or [65536, 131072, 262144, 524288]
for cap in caps:
    t0 = time.monotonic()
    out = np.asarray(
        workq_search(
            dev, qj, *dt_dev, act,
            edit=True, plan=((main_steps, cap),), tail_cap=cap, hq_cap=32768,
            m=m, ns=ns, k=k, ph0=ph0, dedup_every=1,
        )
    )
    hq = 32768
    n_hits = out[4 * hq]
    q_ovf, h_ovf, max_live = out[4 * hq + 1], out[4 * hq + 2], out[4 * hq + 3]
    n_true = out[4 * hq + 4]
    print(
        f"cap={cap}: n_hits={n_hits} n_true={n_true} max_live={max_live} "
        f"q_ovf={q_ovf} h_ovf={h_ovf} dt={time.monotonic() - t0:.1f}s",
        flush=True,
    )
