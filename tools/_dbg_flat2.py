"""Feature-toggle bisect of the cap>=2^18 miscompile in workq expand_step."""
import os
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

import jax.numpy as jnp

qj = jnp.asarray(qarr)
act = jnp.ones(qarr.shape[0], dtype=bool)

CAP = 262144
for dedup_every, packed in [(0, True), (1, False), (0, False)]:
    t0 = time.monotonic()
    out = np.asarray(
        workq_search(
            dev, qj, *dt_dev, act,
            edit=True, plan=((main_steps, CAP),), tail_cap=CAP, hq_cap=32768,
            m=m, ns=ns, k=k, ph0=ph0, dedup_every=dedup_every, packed=packed,
        )
    )
    hq = 32768
    print(
        f"dedup={dedup_every} packed={packed}: n_hits={out[4 * hq]} max_live={out[4 * hq + 3]} "
        f"dt={time.monotonic() - t0:.1f}s",
        flush=True,
    )
