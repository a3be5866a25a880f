"""Benchmark: queries/sec at e=2, 100bp reads (BASELINE.json primary metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the north-star target 10M 100bp reads/min at e=2 on v5e-8
(BASELINE.md), i.e. 166,667 q/s per 8-chip slice — scaled to a single-chip
share of 20,833 q/s since this harness runs on one chip.
"""

from __future__ import annotations

import json
import time

import numpy as np

# single-chip share of the north-star: 10M reads/min / 8 chips
BASELINE_QPS_PER_CHIP = 10_000_000 / 60 / 8

REF_MB = float(__import__("os").environ.get("SAHARA_BENCH_REF_MB", 8))
N_QUERIES = int(__import__("os").environ.get("SAHARA_BENCH_QUERIES", 20000))
READ_LEN = 100
ERRORS = 2


def main() -> None:
    from sahara_tpu.engine.approx import run_scheme_search_chunked
    from sahara_tpu.engine.device import DeviceIndex
    from sahara_tpu.engine.tape import compile_tape
    from sahara_tpu.index.build import build_bifmindex
    from sahara_tpu.schemes import GENERATORS, expand
    from sahara_tpu.sim.read_simulator import Transcript

    rng = np.random.default_rng(1234)
    n_ref = int(REF_MB * 1_000_000)
    ref = rng.integers(1, 5, size=n_ref).astype(np.uint8)

    t0 = time.monotonic()
    host = build_bifmindex([ref], 6, "d_dna5", rate=16)
    index = DeviceIndex.from_host(host)
    t_build = time.monotonic() - t0

    # queries: reads sampled from the reference with <= ERRORS planted errors
    queries = np.empty((N_QUERIES, READ_LEN), dtype=np.int32)
    starts = rng.integers(0, n_ref - READ_LEN - ERRORS, size=N_QUERIES)
    for i, p in enumerate(starts):
        tr = Transcript.generate(rng, READ_LEN, sub=int(rng.integers(0, ERRORS + 1)))
        span = ref[p : p + tr.length_of_ref]
        read = np.frombuffer(bytes(span), dtype=np.uint8).copy()
        # plant substitutions directly in rank space (cheap path)
        subs = [j for j, op in enumerate(tr.ops) if op == "S"]
        for j in subs:
            read[j] = 1 + (read[j] - 1 + rng.integers(1, 4)) % 4
        queries[i] = read[:READ_LEN]

    ess = expand(GENERATORS["h2-k2"].generator(0, ERRORS, 0, 0), READ_LEN)
    tape = compile_tape(ess)

    # warmup (compile one chunk shape)
    chunk = 1024
    run_scheme_search_chunked(index, queries[:chunk], tape, edit=True, s_cap=64, h_cap=16, chunk=chunk)

    t0 = time.monotonic()
    hits = run_scheme_search_chunked(index, queries, tape, edit=True, s_cap=64, h_cap=16, chunk=chunk)
    dt = time.monotonic() - t0
    qps = N_QUERIES / dt

    result = {
        "metric": "queries_per_second_e2_100bp",
        "value": round(qps, 1),
        "unit": "q/s/chip",
        "vs_baseline": round(qps / BASELINE_QPS_PER_CHIP, 4),
    }
    print(json.dumps(result))
    import sys

    print(
        f"# ref={REF_MB}MB build={t_build:.1f}s search={dt:.2f}s "
        f"hits={int(hits.count.sum())} overflow={bool(hits.any_overflow)}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
