"""Pallas TPU kernels for the FM-index rank hot loop.

The engine's fundamental budget is the occ-row gather (one 48-64B row per
rank-all query; ~87M rows/s via XLA's HBM gather on v5e — measured round
1).  This module provides a VMEM-resident Pallas alternative for indexes
whose occ table fits on-chip (E. coli-class references, BASELINE
configs[0-1]): rows are fetched with dynamic VMEM slices inside the
kernel, dodging HBM latency entirely.

Re-designs the reference's ``InterleavedBitvector16`` rank structure
(/root/reference/src/sahara/index.cpp:87 — the "speed-of-light inner
loop" named in BASELINE.json) for the TPU memory system:

- occ rows are padded from 2*sigma int32 to 16 lanes (64B) so EIGHT rows
  tile one 128-lane vector register: the kernel loads ``occ16[i >> 3]``
  (one dynamic sublane slice) and selects the (i & 7) 16-lane group with
  a one-hot multiply-reduce — no dynamic *lane* slicing, which Mosaic
  does not support;
- a grid step processes a block of indices: a ``fori_loop`` of scalar
  dynamic-slice loads (VMEM latency, pipelined by Mosaic) followed by a
  fully vectorized select + checkpoint-add + masked popcount;
- index blocks are scalar-prefetched to SMEM so the loads can issue
  immediately.

Both paths are bit-identical (tests/test_kernels.py).

Round-3 measurement (RANK_r03.json, real v5e, 262k-rank batches): this
kernel reaches 116M ranks/s at E. coli scale — 1.8x the planar XLA gather
— but the *folded* wide-row XLA layout (engine/rank.py, the production
path since round 2) reaches 118M ranks/s on the same workload and 50M at
chr21 scale where the VMEM kernel is ineligible (80MB folded table vs
~16MB VMEM).  The engines therefore keep the folded XLA gather at every
scale; this kernel is retained as the Pallas reference implementation and
the starting point for a future fused seed-scan kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 512  # indices per grid step
_ROWS_PER_VEC = 8  # 16-lane occ rows per 128-lane vector row
_ROW16 = 16


def pack_occ16(occ) -> jax.Array:
    """Pad occ rows (int32[W, 2*sigma]) to 16 lanes and fold 8 rows per
    128-lane vector row: int32[ceil(W/8), 128].  Done once at upload."""
    import numpy as np

    occ = np.asarray(occ)
    w, c = occ.shape
    assert c <= _ROW16
    w_pad = -(-w // _ROWS_PER_VEC) * _ROWS_PER_VEC
    out = np.zeros((w_pad, _ROW16), dtype=np.int32)
    out[:w, :c] = occ
    return jnp.asarray(out.reshape(w_pad // _ROWS_PER_VEC, _ROWS_PER_VEC * _ROW16))


def _rank_kernel(idx_smem_ref, idx_vmem_ref, occ_ref, out_ref, scratch_ref, *, sigma: int):
    """One grid step: rank-all for a block of _BLOCK positions.

    Indices arrive twice: the full array in SMEM (scalar-addressable, feeds
    the dynamic occ-row loads) and the step's block in VMEM (vector math).
    SMEM refs only support scalar loads on Mosaic, hence the split."""
    blk = pl.program_id(0)

    def load(c, _):
        word = idx_smem_ref[blk * _BLOCK + c] >> 5  # occ row of position idx[c]
        scratch_ref[c, :] = occ_ref[pl.ds(word >> 3, 1), :][0]
        return 0

    # full unroll (the only option besides 1 Mosaic lowers) lets the
    # compiler software-pipeline the 512 row copies
    lax.fori_loop(0, _BLOCK, load, 0, unroll=_BLOCK)

    idx = idx_vmem_ref[pl.ds(blk, 1), :].reshape(_BLOCK, 1)
    word = idx >> 5
    group = word & (_ROWS_PER_VEC - 1)  # which 16-lane row inside the vector
    # select the group's 16 lanes without a 3D reshape (Mosaic can't lower
    # (B,128)->(B,8,16)): zero all other groups, then fold the 8 static
    # 16-lane slices together
    rows = scratch_ref[:, :]  # [_BLOCK, 128]
    lane_grp = lax.broadcasted_iota(jnp.int32, (_BLOCK, _ROWS_PER_VEC * _ROW16), 1) >> 4
    masked = jnp.where(lane_grp == group, rows, 0)
    row16 = masked[:, :_ROW16]
    for g in range(1, _ROWS_PER_VEC):
        row16 = row16 + masked[:, g * _ROW16 : (g + 1) * _ROW16]

    ckpt = row16[:, :sigma]
    bits = pltpu.bitcast(row16[:, sigma : 2 * sigma], jnp.uint32)
    off = pltpu.bitcast(idx & 31, jnp.uint32)
    mask = (jnp.uint32(1) << off) - jnp.uint32(1)
    cnt = lax.population_count(bits & mask)
    out_ref[:, :] = ckpt + pltpu.bitcast(cnt, jnp.int32)


_MAX_CALL = 1 << 16  # idx lives in SMEM (1MB total on v5e): 64K ints = 256KB


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def rank_all_vmem(occ16: jax.Array, sigma: int, idx: jax.Array, *, interpret: bool = False) -> jax.Array:
    """rank-all for positions ``idx`` against a VMEM-resident folded occ
    table (from :func:`pack_occ16`).  Returns int32[n, sigma]; ``idx`` is
    padded to a _BLOCK multiple internally and processed in <=64K-index
    calls (the index block is scalar-addressed from SMEM, capacity 1MB)."""
    n = idx.shape[0]
    if n > _MAX_CALL:
        n_pad = -(-n // _MAX_CALL) * _MAX_CALL
        if n_pad != n:
            idx = jnp.concatenate([idx, jnp.zeros(n_pad - n, dtype=jnp.int32)])
        parts = [
            _rank_call(occ16, sigma, idx[o : o + _MAX_CALL], interpret)
            for o in range(0, n_pad, _MAX_CALL)
        ]
        return jnp.concatenate(parts)[:n]
    return _rank_call(occ16, sigma, idx, interpret)[:n]


def _rank_call(occ16: jax.Array, sigma: int, idx: jax.Array, interpret: bool) -> jax.Array:
    n = idx.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    if n_pad != n:
        idx = jnp.concatenate([idx, jnp.zeros(n_pad - n, dtype=jnp.int32)])
    grid = n_pad // _BLOCK
    idx2d = idx.reshape(grid, _BLOCK)
    out = pl.pallas_call(
        functools.partial(_rank_kernel, sigma=sigma),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # all indices, scalar-addressable
            pl.BlockSpec(memory_space=pltpu.VMEM),  # idx as [grid, _BLOCK] rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole folded occ table
        ],
        out_specs=pl.BlockSpec((_BLOCK, sigma), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, sigma), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_BLOCK, _ROWS_PER_VEC * _ROW16), jnp.int32)],
        interpret=interpret,
    )(idx, idx2d, occ16)
    return out


def occ16_vmem_bytes(w_rows: int) -> int:
    """VMEM footprint of the folded table for a W-row occ table."""
    return -(-w_rows // _ROWS_PER_VEC) * _ROWS_PER_VEC * _ROW16 * 4


# --------------------------------------------------------------------------
# HBM-resident variant (VERDICT r4 #5): occ stays in HBM; each grid step
# DMAs its block's rows into VMEM scratch, double-buffered across steps.
# --------------------------------------------------------------------------

_HBLOCK = 512  # indices per grid step


def _rank_hbm_kernel(
    idx_smem_ref, idx_vmem_ref, occ_hbm_ref, out_ref, scratch_ref, sem, *, sigma: int
):
    """One grid step: rank-all for _HBLOCK positions against an occ table
    left in HBM (pltpu.ANY).  Rows are fetched with per-row async copies
    into VMEM scratch — the DMA engine is the only way a Pallas kernel
    can touch dynamic HBM addresses, and per-row copies are exactly the
    pattern XLA's gather engine already performs without per-copy issue
    overhead; this kernel exists to MEASURE that overhead honestly
    (RANK_r05.json).  Mosaic requires 128-lane-aligned HBM slices, so the
    table packs 8 16-lane occ rows per 128-lane line (pack_occ16 layout)
    and the kernel selects the (word & 7) group after the copy."""
    blk = pl.program_id(0)

    def start(c, _):
        line = idx_smem_ref[blk * _HBLOCK + c] >> 8  # (idx >> 5) >> 3
        pltpu.make_async_copy(
            occ_hbm_ref.at[pl.ds(line, 1), :], scratch_ref.at[pl.ds(c, 1), :], sem
        ).start()
        return 0

    lax.fori_loop(0, _HBLOCK, start, 0, unroll=_HBLOCK)

    def wait(c, _):
        line = idx_smem_ref[blk * _HBLOCK + c] >> 8
        pltpu.make_async_copy(
            occ_hbm_ref.at[pl.ds(line, 1), :], scratch_ref.at[pl.ds(c, 1), :], sem
        ).wait()
        return 0

    lax.fori_loop(0, _HBLOCK, wait, 0, unroll=_HBLOCK)

    idx = idx_vmem_ref[pl.ds(blk, 1), :].reshape(_HBLOCK, 1)
    word = idx >> 5
    group = word & (_ROWS_PER_VEC - 1)
    rows = scratch_ref[:, :]  # [_HBLOCK, 128]
    lane_grp = lax.broadcasted_iota(jnp.int32, (_HBLOCK, _ROWS_PER_VEC * _ROW16), 1) >> 4
    masked = jnp.where(lane_grp == group, rows, 0)
    row16 = masked[:, :_ROW16]
    for g in range(1, _ROWS_PER_VEC):
        row16 = row16 + masked[:, g * _ROW16 : (g + 1) * _ROW16]
    ckpt = row16[:, :sigma]
    bits = pltpu.bitcast(row16[:, sigma : 2 * sigma], jnp.uint32)
    off = pltpu.bitcast(idx & 31, jnp.uint32)
    mask = (jnp.uint32(1) << off) - jnp.uint32(1)
    cnt = lax.population_count(bits & mask)
    out_ref[:, :] = ckpt + pltpu.bitcast(cnt, jnp.int32)


def pack_occ16_rows(occ) -> jax.Array:
    """128-lane HBM lines of 8 padded occ rows (identical data layout to
    pack_occ16; separate name kept for the HBM-kernel call sites)."""
    return pack_occ16(occ)


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def rank_all_hbm(occ16r: jax.Array, sigma: int, idx: jax.Array, *, interpret: bool = False) -> jax.Array:
    """rank-all against an HBM-resident occ table (pack_occ16_rows).
    Works at any table size; see _rank_hbm_kernel for why this is a
    measurement vehicle rather than a production path."""
    n = idx.shape[0]
    if n > _MAX_CALL:  # SMEM holds the scalar-addressable index block
        n_pad = -(-n // _MAX_CALL) * _MAX_CALL
        if n_pad != n:
            idx = jnp.concatenate([idx, jnp.zeros(n_pad - n, dtype=jnp.int32)])
        parts = [
            rank_all_hbm(occ16r, sigma, idx[o : o + _MAX_CALL], interpret=interpret)
            for o in range(0, n_pad, _MAX_CALL)
        ]
        return jnp.concatenate(parts)[:n]
    n_pad = -(-n // _HBLOCK) * _HBLOCK
    if n_pad != n:
        idx = jnp.concatenate([idx, jnp.zeros(n_pad - n, dtype=jnp.int32)])
    grid = n_pad // _HBLOCK
    idx2d = idx.reshape(grid, _HBLOCK)
    out = pl.pallas_call(
        functools.partial(_rank_hbm_kernel, sigma=sigma),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # occ stays in HBM
        ],
        out_specs=pl.BlockSpec((_HBLOCK, sigma), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, sigma), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_HBLOCK, _ROWS_PER_VEC * _ROW16), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(idx, idx2d, occ16r)
    return out[:n]
