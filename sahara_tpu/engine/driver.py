"""Search driver: host orchestration of the scheme engine.

The ``runSearch`` analogue (/root/reference/src/sahara/search.cpp:104-274)
minus IO: bucket queries by length (the reference assumes uniform length —
search.cpp:191 expands for queries[0] only; we expand per distinct length),
compile the scheme tape per bucket, run the lockstep stepper, locate hits,
and return (queryId, seqId, pos, errors) rows.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from sahara_tpu.engine.approx import SearchHits, run_scheme_search_chunked
from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.locate import locate
from sahara_tpu.engine.tape import compile_tape
from sahara_tpu.schemes import expand, get_generator, limit_to_hamming
from sahara_tpu.schemes.costs import node_count, optimize_by_wnc, weighted_node_count
from sahara_tpu.schemes.types import Scheme


@dataclasses.dataclass
class SearchResult:
    """Located hits: parallel arrays (row-per-hit)."""

    query_id: np.ndarray
    seq_id: np.ndarray
    pos: np.ndarray
    errors: np.ndarray

    def rows(self) -> list[tuple[int, int, int, int]]:
        return list(zip(self.query_id.tolist(), self.seq_id.tolist(), self.pos.tolist(), self.errors.tolist()))


def _next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n *= 2
    return n


def load_scheme(
    generator_name: str,
    min_k: int,
    max_k: int,
    length: int,
    *,
    edit: bool,
    sigma: int,
    n_text: int,
    dynamic: bool = False,
    verbose_cb=None,
) -> Scheme:
    """Generate + expand a scheme for one query length
    (``loadSearchScheme``, search.cpp:186-212)."""
    gen = get_generator(generator_name)
    oss = gen.generator(min_k, max_k, 0, 0)
    if dynamic:
        partition = optimize_by_wnc(oss, length, sigma, n_text, edit)
        if verbose_cb:
            verbose_cb(f"partition: {partition}")
        ess = expand(oss, partition)
    else:
        ess = expand(oss, length)
    if verbose_cb:
        verbose_cb(f"node count: {node_count(ess, sigma, edit)}")
        verbose_cb(f"weighted node count: {weighted_node_count(ess, sigma, n_text, edit)}")
    return ess


def _locate_hits(
    index: DeviceIndex,
    hits: SearchHits,
    query_ids: np.ndarray,
    max_hits: int = 0,
) -> SearchResult:
    """Expand hit intervals to located (queryId, seqId, pos, err) rows.

    Row order: query-major, then search index, then hit discovery order,
    then SA-interval row — the canonical output order of this framework
    (the reference's emission order follows its DFS; only the hit *set* is
    part of the conformance contract, SURVEY.md §7 "Hard parts")."""
    nq, ns, h_cap = hits.lb.shape
    # valid hit mask per (q, s, h)
    slot = np.arange(h_cap)[None, None, :]
    valid = slot < hits.count[:, :, None]
    q_idx, s_idx, h_idx = np.nonzero(valid)
    lb = hits.lb[q_idx, s_idx, h_idx]
    sz = hits.sz[q_idx, s_idx, h_idx]
    err = hits.err[q_idx, s_idx, h_idx]
    if len(lb) == 0:
        z = np.zeros(0, dtype=np.int64)
        return SearchResult(z, z, z, z)

    cap_rows = max(_next_pow2(int(sz.sum())), 8)
    src, seq_id, pos, row_valid, total = locate(
        index, np.asarray(lb, dtype=np.int32), np.asarray(sz, dtype=np.int32), cap_rows
    )
    src = np.asarray(src)[np.asarray(row_valid)]
    seq_id = np.asarray(seq_id)[np.asarray(row_valid)]
    pos = np.asarray(pos)[np.asarray(row_valid)]

    out_q = query_ids[q_idx[src]]
    out_err = err[src]
    result = SearchResult(
        query_id=out_q.astype(np.int64),
        seq_id=seq_id.astype(np.int64),
        pos=pos.astype(np.int64),
        errors=out_err.astype(np.int64),
    )
    if max_hits > 0:
        keep = np.zeros(len(result.query_id), dtype=bool)
        seen: dict[int, int] = {}
        for i, q in enumerate(result.query_id):
            c = seen.get(int(q), 0)
            if c < max_hits:
                keep[i] = True
                seen[int(q)] = c + 1
        result = SearchResult(
            result.query_id[keep], result.seq_id[keep], result.pos[keep], result.errors[keep]
        )
    return result


def search_queries(
    index: DeviceIndex,
    queries: list[np.ndarray],
    *,
    k: int,
    generator_name: str = "h2-k2",
    edit: bool = True,
    mode: str = "all",
    max_hits: int = 0,
    dynamic: bool = False,
    s_cap: int = 64,
    h_cap: int = 32,
    chunk: int = 1024,
    verbose_cb=None,
) -> SearchResult:
    """Approximate search of rank-array queries against a bidirectional
    device index.  Returns located hits over all queries."""
    sigma = index.sigma
    results: list[SearchResult] = []

    # bucket queries by length (reference assumes uniform length)
    by_len: dict[int, list[int]] = {}
    for i, q in enumerate(queries):
        by_len.setdefault(len(q), []).append(i)

    for length, idxs in sorted(by_len.items()):
        if length == 0:
            continue
        qarr = np.stack([np.asarray(queries[i], dtype=np.int32) for i in idxs])
        qids = np.asarray(idxs, dtype=np.int64)

        if mode == "all":
            ess = load_scheme(
                generator_name, 0, k, length, edit=edit, sigma=sigma, n_text=index.n,
                dynamic=dynamic, verbose_cb=verbose_cb,
            )
            if not edit:
                ess = limit_to_hamming(ess)
            tape = compile_tape(ess)
            hits = run_scheme_search_chunked(
                index, qarr, tape, edit=edit, s_cap=s_cap, h_cap=h_cap, chunk=chunk
            )
            results.append(_locate_hits(index, hits, qids, max_hits=max_hits))
        elif mode == "besthits":
            # strata j = 0..k: stop per query at the first stratum with hits
            # (search_ng21::search_best semantics, search.cpp:234-240)
            active = np.ones(len(idxs), dtype=bool)
            for j in range(k + 1):
                if not active.any():
                    break
                ess = load_scheme(
                    generator_name, j, j, length, edit=edit, sigma=sigma, n_text=index.n,
                    dynamic=dynamic, verbose_cb=verbose_cb,
                )
                if not edit:
                    ess = limit_to_hamming(ess)
                tape = compile_tape(ess)
                hits = run_scheme_search_chunked(
                    index, qarr, tape, edit=edit, active=active, s_cap=s_cap, h_cap=h_cap, chunk=chunk
                )
                res = _locate_hits(index, hits, qids, max_hits=max_hits)
                results.append(res)
                found = set(res.query_id.tolist())
                for li, qi in enumerate(qids):
                    if int(qi) in found:
                        active[li] = False
        else:
            raise ValueError(f"unknown search mode {mode!r}")

    if not results:
        z = np.zeros(0, dtype=np.int64)
        return SearchResult(z, z, z, z)
    merged = SearchResult(
        query_id=np.concatenate([r.query_id for r in results]),
        seq_id=np.concatenate([r.seq_id for r in results]),
        pos=np.concatenate([r.pos for r in results]),
        errors=np.concatenate([r.errors for r in results]),
    )
    # canonical output order: by queryId (stable within)
    order = np.argsort(merged.query_id, kind="stable")
    return SearchResult(
        merged.query_id[order], merged.seq_id[order], merged.pos[order], merged.errors[order]
    )
