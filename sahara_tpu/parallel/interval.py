"""Interval-parallel search: the index sharded by text interval across the
mesh, queries replicated (SURVEY.md §5.7 — the context-parallel analogue
for this workload; BASELINE configs[3]).

Each device owns one (padded) shard's occ tables; every query visits every
shard.  Shard occ tables are padded to a common word count so one SPMD
program serves all devices; per-shard text lengths ride as a dynamic
array.  Hits come back as per-shard packed arrays and are located
host-side against each shard's host index, then mapped to global sequence
ids via the shard's (seqId, window-offset) tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.driver import SearchResult, _merge_results
from sahara_tpu.engine.locate import locate_rows_host
from sahara_tpu.engine.tape import SchemeTape
from sahara_tpu.engine.workq import main_tail_steps, phase0_length, workq_search
from sahara_tpu.index.shard import ShardedIndex
from sahara_tpu.parallel.mesh import DATA_AXIS


def _pad2(a: np.ndarray, rows: int) -> np.ndarray:
    out = np.zeros((rows,) + a.shape[1:], dtype=a.dtype)
    out[: a.shape[0]] = a
    return out


def stack_shards(sh: ShardedIndex, mesh) -> tuple[DeviceIndex, jax.Array, int]:
    """Pad all shards to common shapes and shard the stacked arrays along
    the mesh data axis (one shard per device; shard count must not exceed
    the mesh size — extra devices get empty shards).

    Returns (stacked DeviceIndex with leading shard axis, n per shard,
    padded shard count)."""
    from sahara_tpu.engine.rank import fold_occ_rows, pick_fold

    n_dev = mesh.devices.size
    if sh.num_shards > n_dev:
        raise ValueError(f"{sh.num_shards} shards > {n_dev} devices; use the sequential driver")
    w_max = max(s.occ.shape[0] for s in sh.shards)
    s_max = max(len(s.sample_seq) for s in sh.shards)
    sigma = sh.sigma
    fold = pick_fold(sigma)
    fold_s = 64
    wp = -(-w_max // fold) * fold  # shared padded word count -> static rev offset
    wp_s = -(-w_max // fold_s) * fold_s
    occ, sampled, sseq, spos, c_arr, ns_arr = [], [], [], [], [], []
    for s in sh.shards:
        # forward table padded to wp words, reversed table stacked below at
        # the STATIC folded offset so rev_rows is shard-independent
        occ.append(
            np.concatenate([fold_occ_rows(s.occ, fold, wp), fold_occ_rows(s.occ_rev, fold, wp)])
        )
        sampled.append(fold_occ_rows(s.sampled, fold_s, wp_s))
        sseq.append(_pad2(np.asarray(s.sample_seq), s_max))
        spos.append(_pad2(np.asarray(s.sample_pos), s_max))
        c_arr.append(np.asarray(s.c_arr))
        ns_arr.append(s.n)
    for _ in range(n_dev - sh.num_shards):  # empty filler shards
        occ.append(np.zeros_like(occ[0]))
        sampled.append(np.zeros_like(sampled[0]))
        sseq.append(np.zeros_like(sseq[0]))
        spos.append(np.zeros_like(spos[0]))
        c_arr.append(np.zeros_like(c_arr[0]))
        ns_arr.append(0)

    shard_sp = NamedSharding(mesh, P(DATA_AXIS))
    dev = DeviceIndex(
        occ=jax.device_put(np.stack(occ), shard_sp),
        c_arr=jax.device_put(np.stack(c_arr), shard_sp),
        sampled=jax.device_put(np.stack(sampled), shard_sp),
        sample_seq=jax.device_put(np.stack(sseq), shard_sp),
        sample_pos=jax.device_put(np.stack(spos), shard_sp),
        sigma=sigma,
        rate=sh.shards[0].rate,
        n=max(ns_arr),
        rev_rows=wp,
        fold=fold,
        fold_s=fold_s,
    )
    n_per = jax.device_put(np.asarray(ns_arr, dtype=np.int32).reshape(n_dev, 1), shard_sp)
    return dev, n_per, n_dev


def distributed_interval_search(
    mesh,
    sh: ShardedIndex,
    queries: np.ndarray,  # [nq, m] uniform length
    tape: SchemeTape,
    *,
    edit: bool,
    q_mult: int = 16,
    hit_mult: int = 64,
    dedup: bool = True,
    max_retries: int = 4,
) -> SearchResult:
    """One SPMD step: every device searches ALL queries against ITS text
    shard; hits are located host-side per shard and merged globally."""
    nq, m = queries.shape
    ns = tape.num_searches
    k = tape.max_errors
    ph0 = phase0_length(tape, edit)
    main_steps, _ = main_tail_steps(m, ph0, k, edit)

    stacked, n_per, n_dev = stack_shards(sh, mesh)

    def _cap(x):
        n = 512
        while n < x:
            n *= 2
        return n

    q_cap = _cap(nq * ns * q_mult)
    hq_cap = _cap(nq * hit_mult)

    t_side = jnp.asarray(tape.side)
    t_qpos = jnp.asarray(tape.qpos)
    t_lo = jnp.asarray(tape.lo)
    t_hi = jnp.asarray(tape.hi)
    q_j = jnp.asarray(queries, dtype=jnp.int32)
    active = jnp.ones(nq, dtype=bool)

    idx_spec = jax.tree.map(lambda _: P(DATA_AXIS), stacked)

    for attempt in range(max_retries):
        plan = ((main_steps, q_cap),) if main_steps else ()

        def shard_fn(index, n_loc, q, side, qpos, lo, hi, act):
            local = jax.tree.map(lambda x: x[0] if x.ndim and x.shape[0] == 1 else x, index)
            packed = workq_search(
                local, q, side, qpos, lo, hi, act, n_loc.reshape(()),
                edit=edit, plan=plan, tail_cap=q_cap, hq_cap=hq_cap,
                m=m, ns=ns, k=k, ph0=ph0, dedup_every=1 if dedup else 0,
            )
            return packed.reshape(1, -1)

        fn = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(idx_spec, P(DATA_AXIS), P(), P(), P(), P(), P(), P()),
            out_specs=P(DATA_AXIS, None),
            check_vma=False,
        )
        packed_all = np.asarray(jax.jit(fn)(stacked, n_per, q_j, t_side, t_qpos, t_lo, t_hi, active))
        ovf_q = bool(packed_all[:, 4 * hq_cap + 1].any())
        ovf_h = bool(packed_all[:, 4 * hq_cap + 2].any())
        if not (ovf_q or ovf_h):
            break
        if attempt == max_retries - 1:
            raise RuntimeError("interval search overflowed after retries")
        if ovf_q:
            q_cap *= 2
        if ovf_h:
            hq_cap *= 2

    parts: list[SearchResult] = []
    for i in range(sh.num_shards):
        p = packed_all[i]
        n = int(p[4 * hq_cap])
        if n == 0:
            continue
        lane = p[:n]
        lb = p[hq_cap : hq_cap + n].astype(np.int32)
        sz = p[2 * hq_cap : 2 * hq_cap + n].astype(np.int32)
        err = p[3 * hq_cap : 3 * hq_cap + n]
        order = np.argsort(lane, kind="stable")
        lane, lb, sz, err = lane[order], lb[order], sz[order], err[order]
        cap_rows = max(1 << int(np.ceil(np.log2(max(int(sz.sum()), 2)))), 8)
        host = sh.shards[i]
        dev = DeviceIndex.from_host(host)
        src, seq_id, pos = locate_rows_host(dev, lb, sz, cap_rows)
        del dev
        gid = sh.seq_gid[i][seq_id]
        gpos = pos + sh.seq_off[i][seq_id]
        parts.append(
            SearchResult(
                query_id=(lane[src] // tape.num_searches).astype(np.int64),
                seq_id=gid.astype(np.int64),
                pos=gpos.astype(np.int64),
                errors=err[src].astype(np.int64),
            )
        )
    merged = _merge_results(parts)
    if len(sh.windowed_gids) and len(merged.query_id):
        windowed = np.isin(merged.seq_id, sh.windowed_gids)
        rows = np.stack([merged.query_id, merged.seq_id, merged.pos, merged.errors], axis=1)
        _, first = np.unique(rows, axis=0, return_index=True)
        keep = np.zeros(len(rows), dtype=bool)
        keep[first] = True
        keep |= ~windowed
        merged = SearchResult(
            merged.query_id[keep], merged.seq_id[keep], merged.pos[keep], merged.errors[keep]
        )
    return merged
