"""The workq engine's capacity ceiling must degrade, not fail.

When a chunk's live frontier exceeds workq.HARD_CAP even after the
doubling retries, the grouped driver splits the chunk's ACTIVE query set
in halves (same compiled shapes — no recompile) and searches the halves
synchronously, recursing until the frontier fits.  Output must be
bit-identical to an unconstrained run.  Reference framing: the reference
engine (search_ng24, search.cpp:227-231) has no static buffers and so no
such failure mode — ours must not either.
"""

from __future__ import annotations

import numpy as np

from sahara_tpu.engine import driver as drv
from sahara_tpu.engine import workq
from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.index.build import build_bifmindex


def _workload(seed: int = 0):
    rng = np.random.default_rng(seed)
    # a tandem-repeat text (wide intervals, many hits) with planted-error
    # reads: enough total frontier that 256 queries blow a shrunken cap
    # while any single query stays far under it
    unit = rng.integers(1, 5, size=251).astype(np.uint8)
    ref = np.tile(unit, 100)
    qs = []
    for _ in range(256):
        p = int(rng.integers(0, len(ref) - 36))
        q = ref[p : p + 36].copy()
        at = int(rng.integers(0, 36))
        q[at] = 1 + (q[at] - 1 + int(rng.integers(1, 4))) % 4
        qs.append(q)
    host = build_bifmindex([ref], 6, "d_dna5", rate=16)
    return DeviceIndex.from_host(host), qs


def test_hard_cap_split_is_hit_identical(monkeypatch):
    index, qs = _workload()
    kw = dict(k=1, generator_name="optimum", edit=True, mode="all", engine="workq")
    base = drv.search_queries(index, qs, **kw)
    assert len(base.query_id) > 256  # repeats: many hits per query

    drv._SPLITS = 0
    # measured for this workload: live-queue peak ~900 rows across the
    # 256 queries — a 512 ceiling (the engine's block size) forces the
    # queue past the retry ladder while any single query needs far less
    monkeypatch.setattr(workq, "HARD_CAP", 512)
    split = drv.search_queries(index, qs, **kw)
    assert drv._SPLITS > 0, "shrunken HARD_CAP did not force a split"
    for f in ("query_id", "seq_id", "pos", "errors"):
        np.testing.assert_array_equal(getattr(base, f), getattr(split, f))
