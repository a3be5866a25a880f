"""Rank microbenchmark: XLA gather layouts vs the Pallas kernels.

Secondary metric of BASELINE.json (rank-queries/sec).  Prints one line per
variant; run on the TPU.  SAHARA_RANK_N sets the batch size.

Timing protocol (round 5): ``block_until_ready`` through the tunneled
axon backend is NOT a hard completion barrier — argument-style calls
"complete" in ~0.06ms regardless of table size, which is above the HBM
bandwidth bound and therefore fiction.  The honest protocol chains C
rank batches inside one jit with a DATA DEPENDENCY (batch i+1's indices
derive from batch i's output), hard-syncs via a D2H scalar fetch, and
reports the marginal slope between two chain lengths — per-dispatch
overhead (~23ms through this tunnel) cancels in the subtraction.
Measured checks (tools/rank_timing_check.py): closure-constant tables
also made rank 380x slower in earlier rounds' protocol, so tables ride
as jit ARGUMENTS here, like the engines pass them.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = int(os.environ.get("SAHARA_RANK_N", 262144))
REF_MB = float(os.environ.get("SAHARA_RANK_REF_MB", 4.6))  # E. coli scale
C_SHORT = 4
C_LONG = 16
ROUNDS = 5


def chained_time(step, table, n_pos: int, idx, length: int, rounds: int = ROUNDS) -> float:
    """Wall time of ``length`` data-dependent rank batches in one jit,
    hard-synced by a D2H scalar fetch.  ``step(table, idx) -> int32[n, s]``."""

    @jax.jit
    def f(tab, i):
        def body(cur, _):
            r = step(tab, cur)
            cur = jnp.abs(cur * jnp.int32(1103515245) + jnp.int32(12345) + r[:, 1])
            cur = cur % jnp.int32(n_pos)
            return cur, None

        out, _ = lax.scan(body, i, None, length=length)
        return jnp.sum(out)

    float(np.asarray(f(table, idx)))  # compile + first run
    best = float("inf")
    for _ in range(rounds):
        t0 = time.monotonic()
        float(np.asarray(f(table, idx)))  # scalar fetch: the only real sync
        best = min(best, time.monotonic() - t0)
    return best


def marginal(step, table, n_pos: int, idx) -> tuple[float, float]:
    """(seconds per rank batch, fixed overhead) from the two-point slope."""
    t_s = chained_time(step, table, n_pos, idx, C_SHORT)
    t_l = chained_time(step, table, n_pos, idx, C_LONG)
    per = max((t_l - t_s) / (C_LONG - C_SHORT), 1e-9)
    return per, max(t_s - C_SHORT * per, 0.0)


def _host_occ(ref_mb: float):
    """Host occ table for a random ref of ``ref_mb`` MB, disk-cached (the
    400MB build costs ~20 min of SA-IS; the rank bench only needs occ)."""
    cache = os.path.join(os.path.expanduser("~"), ".cache", "sahara_tpu",
                         f"rankbench_occ{ref_mb}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return z["occ"], int(z["n"]), int(z["sigma"])
    from sahara_tpu.index.build import build_fmindex

    rng = np.random.default_rng(0)
    text = rng.integers(1, 5, size=int(ref_mb * 1_000_000)).astype(np.uint8)
    host = build_fmindex([text], 6, "d_dna5")
    occ = np.asarray(host.occ)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez(cache, occ=occ, n=host.n, sigma=host.sigma)
    return occ, host.n, host.sigma


def run_size(ref_mb: float, n: int, results: list) -> None:
    from sahara_tpu.engine.rank import fold_occ_rows, pick_fold, rank_all
    from sahara_tpu.kernels.rank import occ16_vmem_bytes, pack_occ16, rank_all_vmem

    occ_host, n_text, sigma = _host_occ(ref_mb)
    rng = np.random.default_rng(0)
    # tables ride as jit ARGUMENTS, never closure constants: a captured
    # 600MB table becomes part of the remote_compile payload through the
    # tunnel and kills the transport (same lesson as profile_config3)
    occ = jnp.asarray(occ_host)
    fold = pick_fold(sigma)
    occ_f = jnp.asarray(fold_occ_rows(occ_host, fold))
    idx = jnp.asarray(rng.integers(0, n_text, size=n).astype(np.int32))
    vmem_mb = occ16_vmem_bytes(occ.shape[0]) / 1e6
    print(f"# ref={ref_mb}MB occ rows={occ.shape[0]} hbm={occ.nbytes / 1e6:.1f}MB "
          f"vmem16={vmem_mb:.1f}MB n={n} fold={fold} chain={C_SHORT}->{C_LONG}",
          flush=True)

    def row(name, per, fixed):
        print(f"{name:14s}: {n / per / 1e6:.1f}M ranks/s  ({per * 1e3:.2f} ms/batch"
              f" + {fixed * 1e3:.1f} ms fixed)", flush=True)
        results.append({"variant": name, "ref_mb": ref_mb,
                        "ranks_per_sec": round(n / per), "ms": round(per * 1e3, 3),
                        "fixed_ms": round(fixed * 1e3, 1)})

    row("xla_planar", *marginal(lambda o, i: rank_all(o, sigma, i), occ, n_text, idx))
    row("xla_folded", *marginal(lambda o, i: rank_all(o, sigma, i, fold), occ_f, n_text, idx))

    a = np.asarray(jax.jit(lambda o, i: rank_all(o, sigma, i))(occ, idx))
    b = np.asarray(jax.jit(lambda o, i: rank_all(o, sigma, i, fold))(occ_f, idx))
    assert (a == b).all(), "folded deviates from planar"

    # the Pallas VMEM kernel needs the whole folded table on-chip
    # (~16MB VMEM/core on v5e; leave room for idx/out/scratch blocks)
    if vmem_mb <= float(os.environ.get("SAHARA_RANK_VMEM_MB", 12)):
        occ16 = pack_occ16(occ)
        row("pallas_vmem", *marginal(lambda t, i: rank_all_vmem(t, sigma, i), occ16, n_text, idx))
        assert (a == np.asarray(rank_all_vmem(occ16, sigma, idx))).all(), \
            "pallas deviates from XLA rank"
        print("# bit-identical: True")
    else:
        print("# pallas_vmem skipped: occ table exceeds VMEM")

    # HBM-resident Pallas kernel (VERDICT r4 #5): occ stays in HBM, rows
    # fetched with per-row async DMAs.  Run at every size (it has no VMEM
    # capacity limit) to settle the InterleavedBitvector16 question with
    # a measurement rather than an argument.
    if os.environ.get("SAHARA_RANK_HBM", "1") == "1":
        from sahara_tpu.kernels.rank import pack_occ16_rows, rank_all_hbm

        occ16r = pack_occ16_rows(occ_host)  # device upload of the packed table
        row("pallas_hbm", *marginal(lambda t, i: rank_all_hbm(t, sigma, i), occ16r, n_text, idx))
        assert (a == np.asarray(rank_all_hbm(occ16r, sigma, idx))).all(), \
            "pallas_hbm deviates from XLA rank"
        print("# pallas_hbm bit-identical: True")


def main():
    import json

    results: list = []
    sizes = os.environ.get("SAHARA_RANK_SIZES", f"{REF_MB}")
    for mb in [float(x) for x in sizes.split(",")]:
        run_size(mb, N, results)
    print(json.dumps({"metric": "rank_queries_per_sec", "rows": results}))


if __name__ == "__main__":
    main()
