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
