"""Measure real H2D upload cost through the tunnel for query-chunk-sized
arrays (hard-synced by a dependent D2H scalar fetch)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def consume(x):
    return jnp.sum(x.astype(jnp.int32))


def probe(arr, name, reps=6):
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        d = jnp.asarray(arr)
        float(np.asarray(consume(d)))
        ts.append(time.monotonic() - t0)
    mb = arr.nbytes / 1e6
    best = min(ts)
    print(f"{name:28s}: {mb:7.2f}MB  best {best * 1e3:7.1f}ms = {mb / best:6.1f}MB/s"
          f"  raw {[round(t * 1e3) for t in ts]}", flush=True)


def main() -> None:
    rng = np.random.default_rng(0)
    q32 = rng.integers(0, 6, size=(16384, 100)).astype(np.int32)
    probe(q32, "queries int32 [16384,100]")
    probe(q32.astype(np.uint8), "queries uint8 [16384,100]")
    probe(rng.integers(0, 2**31, size=2_000_000).astype(np.int32), "8MB int32")
    probe(rng.integers(0, 2**31, size=250_000).astype(np.int32), "1MB int32")
    probe(rng.integers(0, 2**31, size=4096).astype(np.int32), "16KB int32")
    # empty round trip: dispatch+sync floor
    z = np.zeros(8, dtype=np.int32)
    probe(z, "32B int32 (sync floor)")


if __name__ == "__main__":
    main()
