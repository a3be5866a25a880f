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


def main():
    from sahara_tpu.engine.rank import rank_all
    from sahara_tpu.index.build import build_fmindex
    from sahara_tpu.kernels.rank import occ16_vmem_bytes, pack_occ16, rank_all_vmem

    rng = np.random.default_rng(0)
    n_ref = int(REF_MB * 1_000_000)
    text = rng.integers(1, 5, size=n_ref).astype(np.uint8)
    host = build_fmindex([text], 6, "d_dna5")
    occ = jnp.asarray(np.asarray(host.occ))
    occ16 = pack_occ16(occ)
    sigma = host.sigma
    idx = jnp.asarray(rng.integers(0, host.n, size=N).astype(np.int32))
    print(f"# occ rows={occ.shape[0]} hbm={occ.nbytes/1e6:.1f}MB "
          f"vmem16={occ16_vmem_bytes(occ.shape[0])/1e6:.1f}MB n={N}")

    xla = jax.jit(lambda i: rank_all(occ, sigma, i))
    t = timeit(xla, idx)
    print(f"xla_take      : {N/t/1e6:.1f}M ranks/s  ({t*1e3:.2f} ms)")

    pallas = jax.jit(lambda i: rank_all_vmem(occ16, sigma, i))
    t = timeit(pallas, idx)
    print(f"pallas_vmem   : {N/t/1e6:.1f}M ranks/s  ({t*1e3:.2f} ms)")

    # sanity: bit-identical
    a = np.asarray(xla(idx))
    b = np.asarray(pallas(idx))
    assert (a == b).all(), "pallas kernel deviates from XLA rank"
    print("# bit-identical: True")


if __name__ == "__main__":
    main()
