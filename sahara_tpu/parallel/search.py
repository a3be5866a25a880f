"""Distributed scheme search: shard_map over the data axis.

Each device runs the lockstep stepper on its query shard against the
replicated index; per-shard hit buffers stay device-local (hits are
located and materialized per shard) while the global hit count is reduced
with ``psum`` over ICI — the TPU-native replacement for the reference's
absent multi-process story (SURVEY.md §5.8).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sahara_tpu.engine.approx import SearchHits, scheme_search
from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.tape import SchemeTape
from sahara_tpu.engine.workq import FlatHits, main_tail_steps, phase0_length, workq_search
from sahara_tpu.parallel.mesh import DATA_AXIS, shard_queries


def distributed_scheme_search(
    mesh,
    index: DeviceIndex,
    queries: np.ndarray,  # [nq, m] host batch (uniform length)
    tape: SchemeTape,
    *,
    edit: bool,
    s_cap: int = 64,
    h_cap: int = 32,
) -> tuple[SearchHits, int]:
    """Run the scheme search data-parallel over the mesh.

    Returns (hits over the original nq queries, global hit count)."""
    nq, m = queries.shape
    ns = tape.num_searches
    k = tape.max_errors
    q_sharded, nq_orig = shard_queries(queries, mesh)
    nq_pad = q_sharded.shape[0]
    n_dev = mesh.devices.size

    t_side = jnp.asarray(tape.side)
    t_qpos = jnp.asarray(tape.qpos)
    t_lo = jnp.asarray(tape.lo)
    t_hi = jnp.asarray(tape.hi)

    # padded lanes beyond nq_orig are masked off via `active`
    active = np.arange(nq_pad) < nq_orig

    def shard_fn(index, q_shard, side, qpos, lo, hi, act):
        h_lb, h_sz, h_err, cnt, fovf, hovf = scheme_search(
            index, q_shard, side, qpos, lo, hi, act,
            edit=edit, s_cap=s_cap, h_cap=h_cap, m=m, ns=ns, k=k,
        )
        total = jax.lax.psum(jnp.sum(cnt), DATA_AXIS)
        return h_lb, h_sz, h_err, cnt, fovf, hovf, total

    idx_spec = jax.tree.map(lambda _: P(), index)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(idx_spec, P(DATA_AXIS, None), P(), P(), P(), P(), P(DATA_AXIS)),
        out_specs=(
            P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS, None),
            P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(),
        ),
        check_vma=False,
    )
    act_sharded = jax.device_put(active, NamedSharding(mesh, P(DATA_AXIS)))
    h_lb, h_sz, h_err, cnt, fovf, hovf, total = jax.jit(fn)(
        index, q_sharded, t_side, t_qpos, t_lo, t_hi, act_sharded
    )

    hits = SearchHits(
        lb=np.asarray(h_lb).reshape(nq_pad, ns, h_cap)[:nq_orig],
        sz=np.asarray(h_sz).reshape(nq_pad, ns, h_cap)[:nq_orig],
        err=np.asarray(h_err).reshape(nq_pad, ns, h_cap)[:nq_orig],
        count=np.asarray(cnt).reshape(nq_pad, ns)[:nq_orig],
        frontier_overflow=np.asarray(fovf).reshape(nq_pad, ns)[:nq_orig],
        hit_overflow=np.asarray(hovf).reshape(nq_pad, ns)[:nq_orig],
    )
    return hits, int(total)


def distributed_workq_search(
    mesh,
    index: DeviceIndex,
    queries: np.ndarray,  # [nq, m] host batch (uniform length)
    tape: SchemeTape,
    *,
    edit: bool,
    q_mult: int = 16,
    hit_mult: int = 64,
    dedup: bool = True,
    max_retries: int = 4,
    active: np.ndarray | None = None,
) -> tuple[FlatHits, int]:
    """Data-parallel work-queue search: each device runs the v2 engine on
    its query shard against the replicated index; per-shard packed hit
    arrays come back stacked along the data axis, the global hit count is
    reduced with psum.  Shard overflows retry with doubled capacities
    (mirroring the single-chip ``run_workq_search``); a persistent overflow
    raises instead of silently dropping hits.

    ``active`` optionally masks queries off (besthits strata / fallback
    subsets); inactive lanes produce no hits.

    Returns (FlatHits with lanes over the ORIGINAL query ids, total)."""
    nq, m = queries.shape
    ns = tape.num_searches
    k = tape.max_errors
    ph0 = phase0_length(tape, edit)
    q_sharded, nq_orig = shard_queries(queries, mesh)
    nq_pad = q_sharded.shape[0]
    n_dev = mesh.devices.size
    nq_local = nq_pad // n_dev

    def _cap(x):
        n = 512
        while n < x:
            n *= 2
        return n

    q_cap = _cap(nq_local * ns * q_mult)
    hq_cap = _cap(nq_local * hit_mult)

    t_side = jnp.asarray(tape.side)
    t_qpos = jnp.asarray(tape.qpos)
    t_lo = jnp.asarray(tape.lo)
    t_hi = jnp.asarray(tape.hi)
    act = np.arange(nq_pad) < nq_orig
    if active is not None:
        act[:nq_orig] &= np.asarray(active, dtype=bool)
    active = act

    main_steps, _ = main_tail_steps(m, ph0, k, edit)

    def make_fn(q_cap, hq_cap):
        plan = ((main_steps, q_cap),) if main_steps else ()

        def shard_fn(index, q_shard, side, qpos, lo, hi, act):
            packed = workq_search(
                index, q_shard, side, qpos, lo, hi, act,
                edit=edit, plan=plan, tail_cap=q_cap, hq_cap=hq_cap,
                m=m, ns=ns, k=k, ph0=ph0, dedup_every=1 if dedup else 0,
            )
            total = jax.lax.psum(packed[4 * hq_cap], DATA_AXIS)
            return packed.reshape(1, -1), total.reshape(1)

        idx_spec = jax.tree.map(lambda _: P(), index)
        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(idx_spec, P(DATA_AXIS, None), P(), P(), P(), P(), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS, None), P(DATA_AXIS)),
            check_vma=False,
        )

    act_sharded = jax.device_put(active, NamedSharding(mesh, P(DATA_AXIS)))
    for attempt in range(max_retries):
        fn = make_fn(q_cap, hq_cap)
        packed_all, totals = jax.jit(fn)(index, q_sharded, t_side, t_qpos, t_lo, t_hi, act_sharded)
        packed_all = np.asarray(packed_all)  # [n_dev, 4*hq_cap+8]
        overflow_q = bool(packed_all[:, 4 * hq_cap + 1].any())
        overflow_h = bool(packed_all[:, 4 * hq_cap + 2].any())
        if not (overflow_q or overflow_h):
            break
        if attempt == max_retries - 1:
            raise RuntimeError(
                "distributed workq search overflowed after retries "
                f"(queue={overflow_q}, hits={overflow_h}); hits would be dropped"
            )
        if overflow_q:
            q_cap *= 2
        if overflow_h:
            hq_cap *= 2

    lanes, lbs, szs, errs = [], [], [], []
    for shard in range(n_dev):
        p = packed_all[shard]
        n = int(p[4 * hq_cap])
        lane = p[:n] + shard * nq_local * ns  # shift local lanes to global
        lanes.append(lane)
        lbs.append(p[hq_cap : hq_cap + n])
        szs.append(p[2 * hq_cap : 2 * hq_cap + n])
        errs.append(p[3 * hq_cap : 3 * hq_cap + n])
    lane = np.concatenate(lanes) if lanes else np.zeros(0, np.int32)
    keep = (lane // ns) < nq_orig
    hits = FlatHits(
        lane=lane[keep],
        lb=np.concatenate(lbs)[keep],
        sz=np.concatenate(szs)[keep],
        err=np.concatenate(errs)[keep],
        n_hits=int(keep.sum()),
        queue_overflow=False,
        hit_overflow=False,
    )
    return hits, hits.n_hits
