"""Isolated correctness check of _compact_matmul at large caps on TPU."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from sahara_tpu.engine.workq import _BLK, _compact_matmul

caps = [int(c) for c in sys.argv[1:]] or [65536, 131072, 262144, 524288]
rng = np.random.default_rng(7)
tri = jnp.triu(jnp.ones((_BLK, _BLK), dtype=jnp.float32))
cm = jax.jit(_compact_matmul, static_argnums=2)

for cap in caps:
    E = 9
    n = cap * E
    fl_np = rng.random(n) < (0.08 / E * 2)  # total ~ 0.16*cap, no overflow
    payload_np = ((rng.integers(0, cap, size=n) << 4) | rng.integers(0, E, size=n)).astype(
        np.int32
    )
    sel, total = cm(jnp.asarray(fl_np), jnp.asarray(payload_np), cap, tri)
    sel, total = np.asarray(sel), int(total)
    want = payload_np[fl_np]
    ok_total = total == len(want)
    ok_sel = np.array_equal(sel[: len(want)], want) and not sel[len(want):].any()
    print(f"cap={cap}: total={total} want={len(want)} ok_total={ok_total} ok_sel={ok_sel}", flush=True)
    if not ok_sel:
        bad = np.nonzero(sel[: len(want)] != want)[0]
        print("  first bad slots:", bad[:10], "got", sel[bad[:5]], "want", want[bad[:5]])
