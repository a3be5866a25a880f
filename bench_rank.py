"""Rank microbenchmark: Pallas VMEM kernel vs the XLA HBM gather path.

Secondary metric of BASELINE.json (rank-queries/sec).  Prints one line per
variant; run on the TPU.  SAHARA_RANK_N sets the batch size."""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("SAHARA_RANK_N", 262144))
REF_MB = float(os.environ.get("SAHARA_RANK_REF_MB", 4.6))  # E. coli scale
REPS = 20


def timeit(fn, *args, rounds=3):
    """Best-of-rounds mean: the tunneled backend has large run-to-run
    variance, so interleaved best-of is the stable comparator."""
    fn(*args).block_until_ready()  # compile
    best = float("inf")
    for _ in range(rounds):
        t0 = time.monotonic()
        for _ in range(REPS):
            out = fn(*args)
        out.block_until_ready()
        best = min(best, (time.monotonic() - t0) / REPS)
    return best


def run_size(ref_mb: float, n: int, results: list) -> None:
    from sahara_tpu.engine.rank import fold_occ_rows, pick_fold, rank_all
    from sahara_tpu.index.build import build_fmindex
    from sahara_tpu.kernels.rank import occ16_vmem_bytes, pack_occ16, rank_all_vmem

    rng = np.random.default_rng(0)
    n_ref = int(ref_mb * 1_000_000)
    text = rng.integers(1, 5, size=n_ref).astype(np.uint8)
    host = build_fmindex([text], 6, "d_dna5")
    occ = jnp.asarray(np.asarray(host.occ))
    sigma = host.sigma
    fold = pick_fold(sigma)
    occ_f = jnp.asarray(fold_occ_rows(np.asarray(host.occ), fold))
    idx = jnp.asarray(rng.integers(0, host.n, size=n).astype(np.int32))
    vmem_mb = occ16_vmem_bytes(occ.shape[0]) / 1e6
    print(f"# ref={ref_mb}MB occ rows={occ.shape[0]} hbm={occ.nbytes / 1e6:.1f}MB "
          f"vmem16={vmem_mb:.1f}MB n={n} fold={fold}")

    def row(name, t):
        print(f"{name:14s}: {n / t / 1e6:.1f}M ranks/s  ({t * 1e3:.2f} ms)")
        results.append({"variant": name, "ref_mb": ref_mb, "ranks_per_sec": round(n / t),
                        "ms": round(t * 1e3, 3)})

    xla = jax.jit(lambda i: rank_all(occ, sigma, i))
    row("xla_planar", timeit(xla, idx))

    folded = jax.jit(lambda i: rank_all(occ_f, sigma, i, fold))
    row("xla_folded", timeit(folded, idx))

    a = np.asarray(xla(idx))
    assert (a == np.asarray(folded(idx))).all(), "folded deviates from planar"

    # the Pallas VMEM kernel needs the whole folded table on-chip
    # (~16MB VMEM/core on v5e; leave room for idx/out/scratch blocks)
    if vmem_mb <= float(os.environ.get("SAHARA_RANK_VMEM_MB", 12)):
        occ16 = pack_occ16(occ)
        pallas = jax.jit(lambda i: rank_all_vmem(occ16, sigma, i))
        row("pallas_vmem", timeit(pallas, idx))
        assert (a == np.asarray(pallas(idx))).all(), "pallas deviates from XLA rank"
        print("# bit-identical: True")
    else:
        print("# pallas_vmem skipped: occ table exceeds VMEM")

    # HBM-resident Pallas kernel (VERDICT r4 #5): occ stays in HBM, rows
    # fetched with per-row async DMAs.  Run at every size (it has no VMEM
    # capacity limit) to settle the InterleavedBitvector16 question with
    # a measurement rather than an argument.
    if os.environ.get("SAHARA_RANK_HBM", "1") == "1":
        from sahara_tpu.kernels.rank import pack_occ16_rows, rank_all_hbm

        occ16r = pack_occ16_rows(np.asarray(host.occ))
        phbm = jax.jit(lambda i: rank_all_hbm(occ16r, sigma, i))
        row("pallas_hbm", timeit(phbm, idx))
        assert (a == np.asarray(phbm(idx))).all(), "pallas_hbm deviates from XLA rank"
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
