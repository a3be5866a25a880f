"""Microbench: _compact_matmul cost vs compaction block size (128/256/512).

The one-hot local-compaction matmul does BLK MACs per source element, so
halving BLK should ~halve the per-source cost while the stitch overhead
(marks + prefix over cap) stays fixed.  Run on TPU after the bench warmup.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

CAP = 28672  # typical mid-tape segment cap
E = 9  # edit branch columns at sigma_live=5
N = CAP * E

rng = np.random.default_rng(0)
# ~25% flag density like the live profile
fl_np = rng.random(N) < 0.24
payload_np = ((rng.integers(0, CAP, size=N) << 4) | rng.integers(0, E, size=N)).astype(np.int32)
fl_j = jnp.asarray(fl_np)
payload_j = jnp.asarray(payload_np)


def make_compact(blk: int):
    tri = jnp.triu(jnp.ones((blk, blk), dtype=jnp.float32))

    def compact(fl, payload, cap):
        n = fl.shape[0]
        rows = n // blk
        fl = lax.optimization_barrier(fl)
        f = fl.reshape(rows, blk).astype(jnp.float32)
        incl = jnp.dot(f, tri, preferred_element_type=jnp.float32)
        loc = incl - f
        cnt_b = incl[:, -1]
        block_off = jnp.cumsum(cnt_b) - cnt_b
        iota_blk = jnp.arange(blk, dtype=jnp.float32)
        oh = jnp.where(
            fl.reshape(rows, blk)[:, :, None],
            (loc[:, :, None] == iota_blk[None, None, :]).astype(jnp.float32),
            0.0,
        )
        src = payload.reshape(rows, blk).astype(jnp.float32)
        out_local = lax.dot_general(
            src[:, None, :], oh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]
        offs_i = block_off.astype(jnp.int32)
        marks = jnp.zeros(cap, jnp.float32).at[jnp.minimum(offs_i, cap)].add(1.0, mode="drop")
        mp = marks.reshape(-1, blk)
        incl_m = jnp.dot(mp, tri, preferred_element_type=jnp.float32)
        row_tot = incl_m[:, -1]
        row_off = jnp.cumsum(row_tot) - row_tot
        b_of_j = (incl_m + row_off[:, None]).reshape(-1).astype(jnp.int32) - 1
        b_c = jnp.clip(b_of_j, 0, rows - 1)
        col = jnp.arange(cap, dtype=jnp.int32) - jnp.take(offs_i, b_c)
        g = b_c * blk + jnp.clip(col, 0, blk - 1)
        total = jnp.sum(cnt_b).astype(jnp.int32)
        live = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(total, cap)
        sel = jnp.where(live, jnp.take(out_local.reshape(-1), g).astype(jnp.int32), 0)
        return sel, total

    return compact


def scan_op(op, l):
    @jax.jit
    def run():
        def body(c, _):
            sel, tot = op(fl_j, payload_j ^ c, CAP)
            return c ^ sel[0] ^ tot, None

        c, _ = lax.scan(body, jnp.int32(1), None, length=l)
        return c

    return run


def slope(name, op, l1=8, l2=72):
    f1, f2 = scan_op(op, l1), scan_op(op, l2)
    for f in (f1, f2):
        f().block_until_ready()

    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.monotonic()
            for _ in range(8):
                out = f()
            out.block_until_ready()
            best = min(best, (time.monotonic() - t0) / 8)
        return best

    per = (t(f2) - t(f1)) / (l2 - l1)
    print(f"{name:24s} {per * 1e6:8.1f} us/step  {per / N * 1e9:6.2f} ns/src  {per / CAP * 1e9:7.1f} ns/capslot")


if __name__ == "__main__":
    # correctness cross-check on CPU semantics first
    ref = None
    for blk in (512, 256, 128):
        sel, tot = jax.jit(make_compact(blk), static_argnums=2)(fl_j, payload_j, CAP)
        sel, tot = np.asarray(sel), int(tot)
        if ref is None:
            ref = (sel, tot)
        else:
            assert tot == ref[1], (blk, tot, ref[1])
            assert np.array_equal(sel, ref[0]), blk
    print("outputs identical across blk; total =", ref[1], "of", N)
    for blk in (512, 256, 128):
        slope(f"compact_blk{blk}", make_compact(blk))
