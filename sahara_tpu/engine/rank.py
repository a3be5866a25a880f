"""Rank/LF primitives on the combined occ layout (jnp; XLA-fused gathers).

These are the speed-of-light inner ops named in BASELINE.json: a rank-all
query is one row gather (2*sigma int32, contiguous) + popcount.  This module
is the portable XLA implementation and the correctness reference; see
``sahara_tpu.kernels`` for the Pallas variants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def occ_row(occ: jax.Array, i: jax.Array) -> jax.Array:
    """Gather the occ rows containing position(s) i. Returns int32[..., 2s]."""
    return jnp.take(occ, i >> 5, axis=0)


def rank_all_from_row(row: jax.Array, sigma: int, i: jax.Array) -> jax.Array:
    """rank-all given a pre-gathered row: int32[..., sigma] counts in bwt[0:i]."""
    ckpt = row[..., :sigma]
    bits = lax.bitcast_convert_type(row[..., sigma:], jnp.uint32)
    off = (i & 31).astype(jnp.uint32)
    mask = (jnp.uint32(1) << off) - jnp.uint32(1)
    cnt = lax.population_count(bits & mask[..., None])
    return ckpt + lax.bitcast_convert_type(cnt, jnp.int32)


def rank_all(occ: jax.Array, sigma: int, i: jax.Array) -> jax.Array:
    """All-sigma ranks at position(s) i: count of each symbol in bwt[0:i]."""
    return rank_all_from_row(occ_row(occ, i), sigma, i)


def rank_all_offset(occ: jax.Array, sigma: int, i: jax.Array, word_off: jax.Array) -> jax.Array:
    """rank-all against a stacked occ table: ``word_off`` selects the
    sub-table (0 = forward, W = reversed) per query position."""
    row = jnp.take(occ, (i >> 5) + word_off, axis=0)
    return rank_all_from_row(row, sigma, i)


def symbol_from_row(row: jax.Array, sigma: int, i: jax.Array) -> jax.Array:
    """BWT symbol at row position i, decoded from the bit-planes."""
    bits = lax.bitcast_convert_type(row[..., sigma:], jnp.uint32)
    off = (i & 31).astype(jnp.uint32)
    sel = (bits >> off[..., None]) & jnp.uint32(1)
    return jnp.argmax(sel, axis=-1).astype(jnp.int32)


def lf(occ: jax.Array, c_arr: jax.Array, sigma: int, i: jax.Array) -> jax.Array:
    """LF-mapping: row of the suffix one position earlier in the text."""
    row = occ_row(occ, i)
    c = symbol_from_row(row, sigma, i)
    r = rank_all_from_row(row, sigma, i)
    rank_c = jnp.take_along_axis(r, c[..., None], axis=-1)[..., 0]
    return jnp.take(c_arr, c) + rank_c


def sampled_bit(sampled: jax.Array, i: jax.Array) -> jax.Array:
    """1 iff SA row i is sampled (int32)."""
    row = jnp.take(sampled, i >> 5, axis=0)
    bits = lax.bitcast_convert_type(row[..., 1], jnp.uint32)
    off = (i & 31).astype(jnp.uint32)
    return lax.bitcast_convert_type((bits >> off) & jnp.uint32(1), jnp.int32)


def sampled_rank(sampled: jax.Array, i: jax.Array) -> jax.Array:
    """Number of sampled rows before row i (the sample slot of row i)."""
    row = jnp.take(sampled, i >> 5, axis=0)
    ckpt = row[..., 0]
    bits = lax.bitcast_convert_type(row[..., 1], jnp.uint32)
    off = (i & 31).astype(jnp.uint32)
    mask = (jnp.uint32(1) << off) - jnp.uint32(1)
    cnt = lax.population_count(bits & mask)
    return ckpt + lax.bitcast_convert_type(cnt, jnp.int32)
