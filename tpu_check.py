"""TPU backend sanity check: run deterministic mini-workloads on the
ambient (TPU) backend and compare hit sets against the hermetic-CPU
result computed in a subprocess.

The unit test suite is hermetic-CPU (tests/conftest.py), so TPU-only
compiler bugs — e.g. the axon backend's fusion miscompiles of stacked
row-gathers and of the one-hot compaction matmul — would otherwise only
surface as silently-wrong bench output.  Run this after touching the
engine step, before trusting a bench number:

    python tpu_check.py

Covers the shapes the bench does NOT: Hamming tapes (e_used=4), small
caps (512), several generators, dedup on/off, edit + Hamming, plus the
seed-and-verify engine (seed scan, window unpack, banded DP, compaction).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CASES = [
    # (generator, k, edit, dedup)
    ("backtracking", 1, False, True),
    ("backtracking", 1, False, False),
    ("optimum", 2, False, True),
    ("optimum", 2, True, True),
    ("h2-k2", 2, True, True),
    ("pigeon_opt", 1, True, False),
]


def run_cases() -> list:
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
    rng = np.random.default_rng(99)
    m = 20
    queries = []
    for _ in range(8):
        s = seqs[rng.integers(0, len(seqs))]
        p = rng.integers(0, len(s) - m + 1)
        q = s[p : p + m].copy()
        j = rng.integers(0, m)
        q[j] = 1 + (q[j] - 1 + rng.integers(1, 4)) % 4  # one substitution
        queries.append(q)
    qarr = np.stack(queries).astype(np.int32)

    out = []
    for gen, k, edit, dedup in CASES:
        ess = expand(GENERATORS[gen].generator(0, k, 0, 0), m)
        if not edit:
            ess = limit_to_hamming(ess)
        tape = compile_tape(ess)
        h = run_workq_search(dev, qarr, tape, edit=edit, dedup=dedup)
        rows = sorted(zip(h.lane.tolist(), h.lb.tolist(), h.sz.tolist(), h.err.tolist()))
        out.append({"case": [gen, k, edit, dedup], "n": h.n_hits, "rows": rows})

    # every gather mode of the hot step on one edit+dedup workload: the
    # folded/packed row-gather patterns are exactly the class the axon
    # backend has miscompiled before
    ess = expand(GENERATORS["optimum"].generator(0, 2, 0, 0), m)
    tape = compile_tape(ess)
    for mode in ("wide", "fold", True, False):
        h = run_workq_search(dev, qarr, tape, edit=True, dedup=True, packed=mode)
        rows = sorted(zip(h.lane.tolist(), h.lb.tolist(), h.sz.tolist(), h.err.tolist()))
        out.append({"case": ["gather", str(mode)], "n": h.n_hits, "rows": rows})

    # seed-and-verify engine (longer queries so k=2 parts stay seedable)
    from sahara_tpu.engine.seedverify import run_sv_search

    m2 = 36
    rng = np.random.default_rng(123)
    q2 = []
    for _ in range(8):
        s = seqs[rng.integers(0, len(seqs))]
        if len(s) < m2:
            continue
        p = rng.integers(0, len(s) - m2 + 1)
        q = s[p : p + m2].copy()
        j = rng.integers(0, m2)
        q[j] = 1 + (q[j] - 1 + rng.integers(1, 4)) % 4
        q2.append(q)
    q2arr = np.stack(q2).astype(np.int32)
    for k, edit in ((1, True), (2, True), (2, False)):
        h = run_sv_search(dev, q2arr, k, edit=edit)
        rows = sorted(zip(h.q_idx.tolist(), h.abs_pos.tolist(), h.err.tolist()))
        out.append({"case": ["sv", k, edit, True], "n": len(rows), "rows": rows})

    # mirrored single-table index (rbi family): right extensions rank the
    # FORWARD table — a distinct gather/offset pattern worth a backend check
    from sahara_tpu.engine.driver import search_queries

    rng = np.random.default_rng(55)
    dseqs = [rng.integers(1, 4, size=260).astype(np.uint8) for _ in range(2)]
    closed = dseqs + [s[::-1].copy() for s in dseqs]
    mhost = build_bifmindex(closed, 4, "dr_dna5", rate=16, mirrored=True)
    mdev = DeviceIndex.from_host(mhost)
    mq = [np.asarray(closed[i % 4][6 * i : 6 * i + 30], dtype=np.uint8) for i in range(6)]
    for engine in ("auto", "workq"):
        r = search_queries(mdev, mq, k=1, edit=True, engine=engine)
        rows = sorted(r.rows())
        out.append({"case": ["mirrored", engine, 1, True], "n": len(rows), "rows": rows})
    return out


def main() -> int:
    if os.environ.get("SAHARA_TPU_CHECK_CHILD") == "1":
        json.dump(run_cases(), sys.stdout)
        return 0

    # hermetic-CPU reference in a subprocess (axon must not engage there)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["SAHARA_TPU_CHECK_CHILD"] = "1"
    env["SAHARA_CAPMEM_PATH"] = "/tmp/sahara_tpu_check_capmem_cpu.json"
    ref = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if ref.returncode != 0:
        print(ref.stderr, file=sys.stderr)
        print("FAIL: hermetic-CPU reference run crashed", file=sys.stderr)
        return 2
    want = json.loads(ref.stdout)

    os.environ["SAHARA_CAPMEM_PATH"] = "/tmp/sahara_tpu_check_capmem_tpu.json"
    import jax

    got = run_cases()
    backend = jax.default_backend()
    bad = 0
    for w, g in zip(want, got):
        ok = [list(r) for r in w["rows"]] == [list(r) for r in g["rows"]]
        status = "ok" if ok else "MISMATCH"
        print(f"{status}  {w['case']}  cpu={w['n']} {backend}={g['n']}")
        bad += not ok
    if bad:
        print(f"FAIL: {bad}/{len(want)} cases diverge between CPU and {backend} — "
              "suspect a backend miscompile (see workq.py barrier notes)", file=sys.stderr)
        return 1
    print(f"PASS: {len(want)} cases bit-identical between hermetic CPU and {backend}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
