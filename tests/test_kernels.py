"""Pallas rank kernel: bit-equality against the XLA reference rank path.

Runs the kernel in interpreter mode so the test is hermetic on any
backend; the compiled-mode perf comparison lives in bench_rank.py."""

import numpy as np
import pytest

from sahara_tpu.engine.rank import rank_all
from sahara_tpu.index.build import build_bifmindex


@pytest.fixture(scope="module")
def occ_fixture():
    rng = np.random.default_rng(3)
    seqs = [rng.integers(1, 5, size=5000).astype(np.uint8)]
    host = build_bifmindex(seqs, 6, "d_dna5")
    import jax.numpy as jnp

    occ = jnp.asarray(np.asarray(host.occ))
    return host, occ


def test_rank_kernel_matches_xla(occ_fixture):
    from sahara_tpu.kernels.rank import pack_occ16, rank_all_vmem

    host, occ = occ_fixture
    sigma = host.sigma
    occ16 = pack_occ16(occ)
    rng = np.random.default_rng(11)
    idx = rng.integers(0, host.n, size=700).astype(np.int32)

    import jax.numpy as jnp

    want = np.asarray(rank_all(occ, sigma, jnp.asarray(idx)))
    got = np.asarray(rank_all_vmem(occ16, sigma, jnp.asarray(idx), interpret=True))
    np.testing.assert_array_equal(got, want)


def test_rank_all_hbm_matches_xla():
    """HBM-resident Pallas rank (interpret mode on CPU) is bit-identical
    to the XLA reference."""
    import numpy as np

    from sahara_tpu.engine.rank import rank_all
    from sahara_tpu.kernels.rank import pack_occ16_rows, rank_all_hbm
    from sahara_tpu.index.build import build_bifmindex

    rng = np.random.default_rng(5)
    ref = rng.integers(1, 5, size=5000).astype(np.uint8)
    host = build_bifmindex([ref], 6, "d_dna5", rate=16)
    occ16r = pack_occ16_rows(host.occ)
    idx = rng.integers(0, host.n, size=700).astype(np.int32)
    import jax.numpy as jnp

    want = rank_all(jnp.asarray(host.occ), 6, jnp.asarray(idx))
    got = rank_all_hbm(occ16r, 6, jnp.asarray(idx), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
