"""Benchmark: queries/sec at e=2, 100bp reads (BASELINE.json primary metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the north-star target 10M 100bp reads/min at e=2 on v5e-8
(BASELINE.md), i.e. 166,667 q/s per 8-chip slice — scaled to a single-chip
share of 20,833 q/s since this harness runs on one chip.

Measures the full production path (scheme search + locate) in steady state:
the first pass warms compile caches and the engine's capacity auto-tuning,
the second pass is timed.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_QPS_PER_CHIP = 10_000_000 / 60 / 8

REF_MB = float(os.environ.get("SAHARA_BENCH_REF_MB", 8))
N_QUERIES = int(os.environ.get("SAHARA_BENCH_QUERIES", 8192))
READ_LEN = 100
ERRORS = 2
GENERATOR = os.environ.get("SAHARA_BENCH_GENERATOR", "h2-k2")


def main() -> None:
    from sahara_tpu.engine.device import DeviceIndex
    from sahara_tpu.engine.driver import search_queries
    from sahara_tpu.index.build import build_bifmindex

    rng = np.random.default_rng(1234)
    n_ref = int(REF_MB * 1_000_000)
    ref = rng.integers(1, 5, size=n_ref).astype(np.uint8)

    t0 = time.monotonic()
    host = build_bifmindex([ref], 6, "d_dna5", rate=16)
    index = DeviceIndex.from_host(host)
    t_build = time.monotonic() - t0

    # queries: reads sampled from the reference with <= ERRORS substitutions
    queries = []
    starts = rng.integers(0, n_ref - READ_LEN, size=N_QUERIES)
    n_subs = rng.integers(0, ERRORS + 1, size=N_QUERIES)
    for p, ns_ in zip(starts, n_subs):
        read = ref[p : p + READ_LEN].copy()
        for j in rng.choice(READ_LEN, size=ns_, replace=False):
            read[j] = 1 + (read[j] - 1 + rng.integers(1, 4)) % 4
        queries.append(read)

    kw = dict(k=ERRORS, generator_name=GENERATOR, edit=True, chunk=2048)

    t0 = time.monotonic()
    r = search_queries(index, queries, **kw)  # compile + cap tuning
    t_warm = time.monotonic() - t0
    t0 = time.monotonic()
    r = search_queries(index, queries, **kw)  # may recompile right-sized caps
    t_tune = time.monotonic() - t0

    t0 = time.monotonic()
    r = search_queries(index, queries, **kw)
    dt = time.monotonic() - t0
    qps = N_QUERIES / dt

    result = {
        "metric": "queries_per_second_e2_100bp",
        "value": round(qps, 1),
        "unit": "q/s/chip",
        "vs_baseline": round(qps / BASELINE_QPS_PER_CHIP, 4),
    }
    print(json.dumps(result))
    print(
        f"# ref={REF_MB}MB build={t_build:.1f}s warm={t_warm:.1f}s tune={t_tune:.1f}s "
        f"steady={dt:.2f}s hits={len(r.query_id)}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
