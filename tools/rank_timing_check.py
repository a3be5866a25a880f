"""Validate the rank-bench timing protocol against the tunneled backend.

bench_rank.py's REPS-loop times repeated calls on IDENTICAL inputs and
blocks once at the end; at the 400MB scale that produced 0.02ms/call —
exactly the HBM-bandwidth bound and 300x the 40MB timing, which smells
like caching/dedup somewhere in the tunnel rather than real execution.

This script times the same kernels with (a) per-call blocking and (b)
a DIFFERENT index vector per rep, at both scales, for both the
closure-constant and explicit-argument styles.

    python tools/rank_timing_check.py [ref_mb]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_rank import _host_occ

N = 262144
REPS = 8


def per_call(fn, argsets):
    jax.block_until_ready(fn(*argsets[0]))  # compile
    ts = []
    for a in argsets:
        t0 = time.monotonic()
        jax.block_until_ready(fn(*a))
        ts.append(time.monotonic() - t0)
    return ts


def main() -> None:
    from sahara_tpu.engine.rank import fold_occ_rows, pick_fold, rank_all

    ref_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 400.0
    occ_host, n_text, sigma = _host_occ(ref_mb)
    fold = pick_fold(sigma)
    occ_f = jnp.asarray(fold_occ_rows(occ_host, fold))
    rng = np.random.default_rng(1)
    idxs = [jnp.asarray(rng.integers(0, n_text, size=N).astype(np.int32)) for _ in range(REPS)]
    same = [idxs[0]] * REPS

    folded_arg = jax.jit(lambda o, i: rank_all(o, sigma, i, fold))

    cases = [
        ("arg, varied idx", folded_arg, [(occ_f, i) for i in idxs]),
        ("arg, same idx", folded_arg, [(occ_f, same[0])] * REPS),
    ]
    # closure-jit embeds the table in the remote_compile payload — only
    # viable at small scale (600MB constants kill the tunnel transport)
    if ref_mb <= 64 or os.environ.get("SAHARA_CHECK_CLOSURE", "") == "1":
        folded_clo = jax.jit(lambda i: rank_all(occ_f, sigma, i, fold))
        cases += [
            ("closure, varied idx", folded_clo, [(i,) for i in idxs]),
            ("closure, same idx", folded_clo, [(same[0],)] * REPS),
        ]
    for name, fn, sets in cases:
        ts = per_call(fn, sets)
        ms = ", ".join(f"{t * 1e3:.2f}" for t in ts)
        print(f"{name:22s}: [{ms}] ms  best {min(ts) * 1e3:.2f}ms = "
              f"{N / min(ts) / 1e6:.1f}M ranks/s", flush=True)

    # ------------------------------------------------------------------
    # sync-semantics probes: block_until_ready through the tunnel may be
    # weaker than a true completion barrier, so
    # (a) chain C gathers with a data dependency inside ONE jit (wall time
    #     must scale ~linearly with C if a single gather's time is real);
    # (b) fetch a dependent scalar to host (D2H is a hard sync).
    n32 = jnp.int32(n_text)

    def chained(C):
        @jax.jit
        def f(o, i):
            def body(cur, _):
                r = rank_all(o, sigma, cur, fold)
                cur = (cur * jnp.int32(1103515245) + jnp.int32(12345) + r[:, 1]) % n32
                cur = jnp.abs(cur)
                return cur, None
            out, _ = jax.lax.scan(body, i, None, length=C)
            return out
        return f

    for C in (1, 8, 32):
        f = chained(C)
        ts = per_call(f, [(occ_f, i) for i in idxs])
        print(f"chained x{C:3d} (scan dep): best {min(ts) * 1e3:.2f}ms = "
              f"{min(ts) / C * 1e3:.3f}ms/gather = "
              f"{N * C / min(ts) / 1e6:.1f}M ranks/s", flush=True)

    f1 = jax.jit(lambda o, i: jnp.sum(rank_all(o, sigma, i, fold)))
    jax.block_until_ready(f1(occ_f, idxs[0]))
    ts = []
    for i in idxs:
        t0 = time.monotonic()
        float(np.asarray(f1(occ_f, i)))  # D2H scalar: hard sync
        ts.append(time.monotonic() - t0)
    print(f"D2H scalar fetch      : best {min(ts) * 1e3:.2f}ms = "
          f"{N / min(ts) / 1e6:.1f}M ranks/s", flush=True)


if __name__ == "__main__":
    main()
