"""Work-queue scheme-search engine (v2): one dense global state queue.

The v1 stepper (sahara_tpu.engine.approx) gives every (query, search) lane a
fixed per-lane frontier — robust, but most slots are dead most of the time
while bursty lanes overflow.  This engine keeps ONE dense queue of live
states shared by all lanes (the classic work-queue inversion), so per-step
cost tracks the *actual* number of search-tree nodes.  TPU-specific design
(informed by microbenchmarks on v5e):

- gathers pay a large fixed cost per op -> everything a step needs is
  packed so the step issues only four gather ops: one fused occ-row gather
  (both interval edges in a single take), one per-lane tape word
  (side|lo|hi|query-char precomputed per lane), one state-matrix row
  gather, one rank-product row gather;
- no integer div/mod in the hot loop (TPU has no hardware divide): the
  candidate matrix is [Q, 16] so parent/branch are shift/mask, and
  search/query ids live in meta bit fields;
- stream compaction uses matmul prefix sums (a [*, 512] block against a
  constant triangular matrix on the MXU) instead of lane-axis cumsums;
- states can only finish in the last k+1 steps (d advances by at most one
  per step), so the hit-drain compaction runs only in a short tail scan.

State = rows of an int32[Q, 4] matrix: (lb, lbr, sz, meta) with meta =
op(4) | err(4) | d(10) | s_id(3) | q_id(11).  Transition semantics are
identical to v1 (match/sub/del/ins, minimal-span edge flags, I-D adjacency
suppression) — property-tested for bit-identical hit multisets.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.engine.rank import rank_all_from_row
from sahara_tpu.engine.tape import SchemeTape

OP_MATCH, OP_INS, OP_DEL = 0, 1, 2
_EDGE_L, _EDGE_R = 4, 8
_OPF_MASK = 0xF  # op + edge flags
_ERR_SHIFT, _D_SHIFT, _S_SHIFT, _Q_SHIFT = 4, 8, 18, 21
_ERR_MASK, _D_MASK, _S_MASK, _Q_MASK = 0xF, 0x3FF, 0x7, 0x7FF

MAX_NQ = _Q_MASK + 1  # 2048 queries per chunk
MAX_NS = _S_MASK + 1  # 8 searches per tape
MAX_M = _D_MASK  # 1023
MAX_ERR = _ERR_MASK

_BLK = 512


@dataclasses.dataclass
class FlatHits:
    """Global hit list: parallel arrays over hits (not per-lane)."""

    lane: np.ndarray  # int32[H] — lane = query * ns + search
    lb: np.ndarray
    sz: np.ndarray
    err: np.ndarray
    n_hits: int
    queue_overflow: bool
    hit_overflow: bool
    max_live: int = 0


def _positions(flags: jax.Array, tri: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Exclusive positions of set flags (flat bool[N], N % 512 == 0) via an
    MXU prefix-sum: block-local positions from a triangular matmul, block
    offsets from a small cumsum.  Returns (pos int32[N], total int32)."""
    n = flags.shape[0]
    rows = n // _BLK
    f = flags.reshape(rows, _BLK).astype(jnp.float32)
    incl = jnp.dot(f, tri, preferred_element_type=jnp.float32)  # inclusive
    # block-local values are <= 512 (exact in f32); the cross-block offsets
    # can exceed 2^24 for large queues, so accumulate those in int32
    row_tot = incl[:, -1].astype(jnp.int32)
    row_off = jnp.cumsum(row_tot) - row_tot
    pos = (incl - f).astype(jnp.int32).reshape(rows, _BLK) + row_off[:, None]
    total = row_off[-1] + row_tot[-1]
    return pos.reshape(-1), total


def _pack_lane_tape(
    queries: jax.Array, t_side: jax.Array, t_qpos: jax.Array, t_lo: jax.Array, t_hi: jax.Array, ns: int
) -> jax.Array:
    """Per-lane tape words [b, m]: side | lo<<1 | hi<<5 | qc<<9.

    Folding the query character into the tape removes two gathers from the
    hot loop (tape and query lookups become one)."""
    nq, m = queries.shape
    qc = queries[:, None, :]  # [nq, 1, m] — will index by qpos
    qpos = t_qpos[None, :, :]  # [1, ns, m]
    qc_at = jnp.take_along_axis(jnp.broadcast_to(qc, (nq, ns, m)), jnp.broadcast_to(qpos, (nq, ns, m)), axis=2)
    word = (
        t_side[None, :, :]
        | (t_lo[None, :, :] << 1)
        | (t_hi[None, :, :] << 5)
        | (qc_at << 9)
    )
    return word.reshape(nq * ns, m)


@partial(
    jax.jit,
    static_argnames=("edit", "q_cap", "hq_cap", "m", "ns", "k", "ph0", "dedup"),
)
def workq_search(
    index: DeviceIndex,
    queries: jax.Array,  # int32[nq, m]
    t_side: jax.Array,  # int32[ns, m]
    t_qpos: jax.Array,
    t_lo: jax.Array,
    t_hi: jax.Array,
    active: jax.Array,  # bool[nq]
    *,
    edit: bool,
    q_cap: int,
    hq_cap: int,
    m: int,
    ns: int,
    k: int,
    ph0: int,
    dedup: bool = False,
):
    """Returns one packed int32 array [4*hq_cap + 8]:
    h_lane | h_lb | h_sz | h_err | (n_hits, q_overflow, h_overflow, pad)."""
    nq = queries.shape[0]
    sigma = index.sigma
    b = nq * ns
    if nq > MAX_NQ or ns > MAX_NS or m > MAX_M or k > MAX_ERR or sigma > 8:
        raise ValueError("workq meta packing limits exceeded (nq<=2048, ns<=8, m<=1023, k<=15, sigma<=8)")
    if index.rev_rows == 0:
        raise ValueError("scheme search requires a bidirectional index")
    assert q_cap % _BLK == 0 and hq_cap % _BLK == 0

    occ, c_arr, rev_rows = index.occ, index.c_arr, index.rev_rows
    tri = jnp.triu(jnp.ones((_BLK, _BLK), dtype=jnp.float32))

    lane_tape = _pack_lane_tape(queries, t_side, t_qpos, t_lo, t_hi, ns).reshape(-1)

    lanes = jnp.arange(b, dtype=jnp.int32)
    s_id0 = lanes % ns  # outside the scan: fine
    q_id0 = lanes // ns
    lane_active = jnp.take(active, q_id0)

    n_ms = sigma - 1
    e_pad = 16 if edit else 8

    def fused_rank(primary, sz, word_off):
        """One gather for both interval edges: rank-all rows at primary and
        primary+sz.  Returns (r_lo, r_hi) each [n, sigma].  The barrier pins
        the gather result as materialized — without it XLA fuses the gather
        into every broadcast consumer and re-executes it per candidate
        column."""
        n = primary.shape[0]
        pos = jnp.concatenate([primary, primary + sz])
        woff = jnp.concatenate([word_off, word_off])
        rows = jnp.take(occ, (pos >> 5) + woff, axis=0)
        ranks = rank_all_from_row(rows, sigma, pos)
        ranks = lax.optimization_barrier(ranks)
        return ranks[:n], ranks[n:]

    # ---------------- phase 0: exact seed, one state per lane ------------
    def ph0_step(carry, t):
        lb, lbr, sz = carry
        word = jnp.take(lane_tape, lanes * m + t)
        side = word & 1
        qc = (word >> 9) & 0xFF
        primary = jnp.where(side == 1, lbr, lb)
        secondary = jnp.where(side == 1, lb, lbr)
        r_lo, r_hi = fused_rank(primary, sz, side * rev_rows)
        cnt = r_hi - r_lo
        prefix = jnp.cumsum(cnt, axis=-1) - cnt
        c = qc[:, None]
        newp = jnp.take_along_axis(c_arr[None, :sigma] + r_lo, c, axis=1)[:, 0]
        news = secondary + jnp.take_along_axis(prefix, c, axis=1)[:, 0]
        nsz = jnp.take_along_axis(cnt, c, axis=1)[:, 0]
        lb = jnp.where(side == 1, news, newp)
        lbr = jnp.where(side == 1, newp, news)
        return (lb, lbr, jnp.maximum(nsz, 0)), None

    lb0 = jnp.zeros(b, dtype=jnp.int32)
    lbr0 = jnp.zeros(b, dtype=jnp.int32)
    sz0 = jnp.where(lane_active, jnp.int32(index.n), 0)
    (lb0, lbr0, sz0), _ = lax.scan(ph0_step, (lb0, lbr0, sz0), jnp.arange(ph0, dtype=jnp.int32))

    # ---------------- pack into the state matrix -------------------------
    meta0 = (jnp.int32(ph0) << _D_SHIFT) | (s_id0 << _S_SHIFT) | (q_id0 << _Q_SHIFT)
    state0 = jnp.zeros((q_cap, 4), dtype=jnp.int32)
    state0 = state0.at[:b, 0].set(lb0)
    state0 = state0.at[:b, 1].set(lbr0)
    state0 = state0.at[:b, 2].set(sz0)
    state0 = state0.at[:b, 3].set(jnp.where(sz0 > 0, meta0, 0))

    def expand_step(state, drain, hits, n_hits, q_ovf, h_ovf, max_live):
        """One generic step: candidates -> compaction -> new state matrix."""
        q_lb, q_lbr, q_sz, meta = state[:, 0], state[:, 1], state[:, 2], state[:, 3]
        opf = meta & _OPF_MASK
        err = (meta >> _ERR_SHIFT) & _ERR_MASK
        d = (meta >> _D_SHIFT) & _D_MASK
        s_id = (meta >> _S_SHIFT) & _S_MASK
        q_id = (meta >> _Q_SHIFT) & _Q_MASK
        alive = q_sz > 0

        if drain:
            done = alive & (d >= m)
            finished = done & ((opf & (_EDGE_L | _EDGE_R)) == 0)
            fpos, ftot = _positions(finished, tri)
            # dead/overflow slots get an out-of-bounds destination: with
            # mode="drop" they never reach memory (a shared in-bounds dump
            # slot would serialize millions of colliding writes on TPU)
            fdest = jnp.where(finished, n_hits + fpos, hq_cap)
            idxs = jnp.arange(q_cap, dtype=jnp.int32)
            sel_h = (
                jnp.full(hq_cap, q_cap, dtype=jnp.int32)
                .at[fdest]
                .set(idxs, mode="drop")
            )
            got = sel_h < q_cap
            sel_hc = jnp.minimum(sel_h, q_cap - 1)
            slot_new = jnp.arange(hq_cap, dtype=jnp.int32) >= n_hits
            upd = slot_new & got
            lane_all = q_id * ns + s_id
            h_lane, h_lb, h_sz, h_err = hits
            h_lane = jnp.where(upd, jnp.take(lane_all, sel_hc), h_lane)
            h_lb = jnp.where(upd, jnp.take(q_lb, sel_hc), h_lb)
            h_sz = jnp.where(upd, jnp.take(q_sz, sel_hc), h_sz)
            h_err = jnp.where(upd, jnp.take(err, sel_hc), h_err)
            hits = (h_lane, h_lb, h_sz, h_err)
            h_ovf = h_ovf | (n_hits + ftot > hq_cap)
            n_hits = jnp.minimum(n_hits + ftot, hq_cap)
            alive = alive & ~done

        # ---- one tape-word gather + one fused occ gather ----------------
        dc = jnp.minimum(d, m - 1)
        lane = q_id * ns + s_id
        word = lax.optimization_barrier(jnp.take(lane_tape, lane * m + dc))
        side = word & 1
        lo_b = (word >> 1) & 0xF
        hi_b = (word >> 5) & 0xF
        qc = (word >> 9) & 0xFF

        primary = jnp.where(side == 1, q_lbr, q_lb)
        secondary = jnp.where(side == 1, q_lb, q_lbr)
        r_lo, r_hi = fused_rank(primary, q_sz, side * rev_rows)
        cnt = r_hi - r_lo
        prefix = jnp.cumsum(cnt, axis=-1) - cnt
        newp = c_arr[None, :sigma] + r_lo
        news = secondary[:, None] + prefix
        # rank products packed for one row-gather later: [Q*sigma, 3]
        prod = lax.optimization_barrier(jnp.stack([cnt, newp, news], axis=-1).reshape(-1, 3))

        # ---- candidate flags [Q, e_pad] ---------------------------------
        syms = jnp.arange(1, sigma, dtype=jnp.int32)[None, :]
        e_ms = err[:, None] + (qc[:, None] != syms)
        ok_ms = (
            alive[:, None]
            & (cnt[:, 1:] > 0)
            & (e_ms <= hi_b[:, None])
            & (e_ms >= lo_b[:, None])
        )
        cols = [ok_ms]
        if edit:
            last = opf & 0x3
            ok_del = (
                alive[:, None]
                & (cnt[:, 1:] > 0)
                & ((err + 1)[:, None] <= hi_b[:, None])
                & (d[:, None] > 0)
                & (last[:, None] != OP_INS)
            )
            ok_ins = (
                alive & (err + 1 <= hi_b) & (err + 1 >= lo_b) & (last != OP_DEL)
            )[:, None]
            cols += [ok_del, ok_ins]
        flags = jnp.concatenate(cols, axis=1)
        pad = e_pad - flags.shape[1]
        if pad:
            flags = jnp.concatenate([flags, jnp.zeros((q_cap, pad), dtype=bool)], axis=1)

        fl = flags.reshape(-1)
        pos, total = _positions(fl, tri)
        q_ovf = q_ovf | (total > q_cap)
        max_live = jnp.maximum(max_live, total)
        cand_ids = jnp.arange(q_cap * e_pad, dtype=jnp.int32)
        dest = jnp.where(fl, pos, q_cap)  # dead -> out of bounds -> dropped
        sel = jnp.zeros(q_cap, dtype=jnp.int32).at[dest].set(cand_ids, mode="drop")
        sel = lax.optimization_barrier(sel)
        live = jnp.arange(q_cap, dtype=jnp.int32) < jnp.minimum(total, q_cap)

        parent = sel >> 4 if e_pad == 16 else sel >> 3
        branch = sel & (e_pad - 1)

        # ---- survivor fields: 2 row gathers -----------------------------
        p_state = jnp.take(state, parent, axis=0)  # [Q, 4]
        p_lb, p_lbr, p_sz, p_meta = p_state[:, 0], p_state[:, 1], p_state[:, 2], p_state[:, 3]
        p_opf = p_meta & _OPF_MASK
        p_err = (p_meta >> _ERR_SHIFT) & _ERR_MASK
        p_d = (p_meta >> _D_SHIFT) & _D_MASK
        p_rest = p_meta & ~jnp.int32(_OPF_MASK | (_ERR_MASK << _ERR_SHIFT) | (_D_MASK << _D_SHIFT))
        p_side = jnp.take(side, parent)
        p_qc = jnp.take(qc, parent)

        is_del = (branch >= n_ms) & (branch < 2 * n_ms) if edit else jnp.zeros_like(branch, dtype=bool)
        is_ins = (branch >= 2 * n_ms) if edit else jnp.zeros_like(branch, dtype=bool)
        sym = jnp.where(branch < n_ms, branch + 1, branch - n_ms + 1)
        sym = jnp.clip(sym, 1, sigma - 1)

        g = jnp.take(prod, parent * sigma + sym, axis=0)  # [Q, 3]
        g_cnt, g_newp, g_news = g[:, 0], g[:, 1], g[:, 2]
        ext_lb = jnp.where(p_side == 1, g_news, g_newp)
        ext_lbr = jnp.where(p_side == 1, g_newp, g_news)

        if edit:
            new_lb = jnp.where(is_ins, p_lb, ext_lb)
            new_lbr = jnp.where(is_ins, p_lbr, ext_lbr)
            new_sz = jnp.where(is_ins, p_sz, g_cnt)
            new_err = jnp.where(branch < n_ms, p_err + (p_qc != sym), p_err + 1)
            new_d = jnp.where(is_del, p_d, p_d + 1)
            edge_bit = jnp.where(p_side == 0, _EDGE_L, _EDGE_R)
            other_bit = jnp.where(p_side == 0, _EDGE_R, _EDGE_L)
            ms_op = p_opf & other_bit
            del_op = OP_DEL | (p_opf & (_EDGE_L | _EDGE_R)) | edge_bit
            ins_op = OP_INS | (p_opf & (_EDGE_L | _EDGE_R))
            new_op = jnp.where(branch < n_ms, ms_op, jnp.where(is_del, del_op, ins_op))
        else:
            new_lb, new_lbr, new_sz = ext_lb, ext_lbr, g_cnt
            new_err = p_err + (p_qc != sym)
            new_d = p_d + 1
            new_op = jnp.zeros_like(p_opf)

        new_sz = jnp.where(live, new_sz, 0)
        new_meta = new_op | (new_err << _ERR_SHIFT) | (new_d << _D_SHIFT) | p_rest
        new_meta = jnp.where(live, new_meta, 0)

        if dedup:
            # merge PURE duplicates: states identical in every field (they
            # arise from different operation orderings — e.g. I..D vs D..I —
            # with identical futures).  One hash probe; collisions between
            # distinct states are simply not merged (safe).  Hit sets are
            # unchanged; only duplicate multiplicity shrinks.
            hsh = (
                new_lb * jnp.int32(0x9E3779B1 - (1 << 32))
                ^ new_lbr * jnp.int32(0x85EBCA77 - (1 << 32))
                ^ new_sz * jnp.int32(0xC2B2AE3D - (1 << 32))
                ^ new_meta * jnp.int32(0x27D4EB2F)
            ) & (q_cap - 1)
            row_ids = jnp.arange(q_cap, dtype=jnp.int32)
            table = jnp.zeros(q_cap, dtype=jnp.int32).at[hsh].set(row_ids)
            win = jnp.take(table, hsh)
            w_lb = jnp.take(new_lb, win)
            w_lbr = jnp.take(new_lbr, win)
            w_sz = jnp.take(new_sz, win)
            w_meta = jnp.take(new_meta, win)
            same = (
                (w_lb == new_lb) & (w_lbr == new_lbr)
                & (w_sz == new_sz) & (w_meta == new_meta)
            )
            kill = same & (win != row_ids) & (new_sz > 0)
            new_sz = jnp.where(kill, 0, new_sz)

        new_state = jnp.stack([new_lb, new_lbr, new_sz, new_meta], axis=1)
        return new_state, hits, n_hits, q_ovf, h_ovf, max_live

    hits0 = (
        jnp.zeros(hq_cap, dtype=jnp.int32),
        jnp.zeros(hq_cap, dtype=jnp.int32),
        jnp.zeros(hq_cap, dtype=jnp.int32),
        jnp.zeros(hq_cap, dtype=jnp.int32),
    )
    n_hits0 = jnp.int32(0)
    ovf0 = jnp.bool_(False)

    # main segment: no state can have finished yet (d grows by <= 1/step)
    main_steps = max(m - ph0 - 1, 0)
    tail_steps = (m - ph0) + 1 + (k if edit else 0) - main_steps

    def main_body(carry, _):
        state, q_ovf, max_live = carry
        state, _, _, q_ovf, _, max_live = expand_step(state, False, hits0, n_hits0, q_ovf, ovf0, max_live)
        return (state, q_ovf, max_live), None

    (state, q_ovf, max_live), _ = lax.scan(main_body, (state0, ovf0, jnp.int32(0)), None, length=main_steps)

    def tail_body(carry, _):
        state, hits, n_hits, q_ovf, h_ovf, max_live = carry
        state, hits, n_hits, q_ovf, h_ovf, max_live = expand_step(state, True, hits, n_hits, q_ovf, h_ovf, max_live)
        return (state, hits, n_hits, q_ovf, h_ovf, max_live), None

    (state, hits, n_hits, q_ovf, h_ovf, max_live), _ = lax.scan(
        tail_body, (state, hits0, n_hits0, q_ovf, ovf0, max_live), None, length=tail_steps
    )
    h_lane, h_lb, h_sz, h_err = hits
    # pack everything into ONE output array: device->host transfers pay a
    # large fixed latency on tunneled backends, so one transfer, not seven
    tailvals = jnp.zeros(8, dtype=jnp.int32)
    tailvals = tailvals.at[0].set(n_hits)
    tailvals = tailvals.at[1].set(q_ovf.astype(jnp.int32))
    tailvals = tailvals.at[2].set(h_ovf.astype(jnp.int32))
    tailvals = tailvals.at[3].set(max_live)
    return jnp.concatenate([h_lane, h_lb, h_sz, h_err, tailvals])


def phase0_length(tape: SchemeTape, edit: bool) -> int:
    """Steps during which every search still has u == 0: single-state
    frontier, steppable in place."""
    hi = tape.hi
    ph0 = 0
    for t in range(tape.length):
        if (hi[:, t] == 0).all():
            ph0 = t + 1
        else:
            break
    return ph0


# last successful (q_cap, hq_cap) per workload signature: retries are
# expensive (a full extra search run + possibly a compile), so later calls
# start from capacities that worked
_CAP_MEMORY: dict[tuple, tuple[int, int]] = {}


def _pow2_cap(x: int) -> int:
    n = _BLK
    while n < x:
        n *= 2
    return n


def run_workq_search(
    index: DeviceIndex,
    queries: np.ndarray,
    tape: SchemeTape,
    *,
    edit: bool,
    active: np.ndarray | None = None,
    q_mult: int = 16,
    hit_mult: int = 32,
    max_retries: int = 4,
    device_tape: tuple | None = None,
    dedup: bool = False,
) -> FlatHits:
    """Host wrapper with overflow retry (doubling queue/hit capacity).

    ``device_tape`` optionally supplies pre-uploaded (side, qpos, lo, hi)
    device arrays so repeated chunk calls skip the host->device latency."""
    nq, m = queries.shape
    ns = tape.num_searches
    k = tape.max_errors
    b = nq * ns
    ph0 = phase0_length(tape, edit)
    queries_j = jnp.asarray(queries, dtype=jnp.int32)
    act = np.ones(nq, dtype=bool) if active is None else np.asarray(active, dtype=bool)
    if device_tape is None:
        device_tape = upload_tape(tape)
    t_side, t_qpos, t_lo, t_hi = device_tape

    cap_key = (nq, ns, m, k, edit, dedup, int(index.n))
    q_cap, hq_cap = _CAP_MEMORY.get(
        cap_key, (_pow2_cap(b * q_mult), _pow2_cap(nq * hit_mult))
    )
    for attempt in range(max_retries):
        packed = workq_search(
            index, queries_j, t_side, t_qpos, t_lo, t_hi, jnp.asarray(act),
            edit=edit, q_cap=q_cap, hq_cap=hq_cap, m=m, ns=ns, k=k, ph0=ph0,
            dedup=dedup,
        )
        packed = np.asarray(packed)  # ONE device->host transfer
        n_hits = int(packed[4 * hq_cap])
        q_ovf_b = bool(packed[4 * hq_cap + 1])
        h_ovf_b = bool(packed[4 * hq_cap + 2])
        max_live = int(packed[4 * hq_cap + 3])
        if not (q_ovf_b or h_ovf_b) or attempt == max_retries - 1:
            # right-size future calls from the observed peaks, quantized to
            # powers of two to bound the number of compiled variants; the
            # stored value only grows across chunks, so it converges to the
            # workload's true peak (x1.3 margin) and stays there
            # pow2 rounding supplies the safety margin in the common case
            want_q = _pow2_cap(max_live + b)
            want_h = _pow2_cap(n_hits + _BLK)
            old_q, old_h = _CAP_MEMORY.get(cap_key, (0, 0))
            _CAP_MEMORY[cap_key] = (max(want_q, old_q), max(want_h, old_h))
            n = n_hits
            return FlatHits(
                lane=packed[:n],
                lb=packed[hq_cap : hq_cap + n],
                sz=packed[2 * hq_cap : 2 * hq_cap + n],
                err=packed[3 * hq_cap : 3 * hq_cap + n],
                n_hits=n,
                queue_overflow=q_ovf_b,
                hit_overflow=h_ovf_b,
                max_live=max_live,
            )
        if q_ovf_b:
            q_cap *= 2
        if h_ovf_b:
            hq_cap *= 2
    raise AssertionError("unreachable")


def upload_tape(tape: SchemeTape) -> tuple:
    """Upload tape arrays to device once (reused across query chunks)."""
    return (
        jnp.asarray(tape.side),
        jnp.asarray(tape.qpos),
        jnp.asarray(tape.lo),
        jnp.asarray(tape.hi),
    )
