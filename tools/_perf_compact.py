"""Scatter vs MXU one-hot block compaction at bench shapes.

Compaction of N=e*cap flagged payloads into cap slots:
  A) XLA scatter .at[dest].set(payload)           (current engine)
  B) per-512-block one-hot matmul local compaction + mark-prefix stitch
Both must produce identical results."""
import numpy as np, time, jax, jax.numpy as jnp
from jax import lax

CAP = 28672
E = 9
N = CAP * E
rng = np.random.default_rng(0)
fl_np = rng.random(N) < 0.08
payload_np = ((rng.integers(0, CAP, size=N) << 4) | rng.integers(0, E, size=N)).astype(np.int32)
fl0 = jnp.asarray(fl_np)
payload = jnp.asarray(payload_np)
tri = jnp.triu(jnp.ones((512, 512), dtype=jnp.float32))
iota512 = jnp.arange(512, dtype=jnp.float32)

def positions(fl):
    f = fl.reshape(-1, 512).astype(jnp.float32)
    incl = jnp.dot(f, tri, preferred_element_type=jnp.float32)
    row_tot = incl[:, -1]
    row_off = jnp.cumsum(row_tot) - row_tot
    pos = (incl - f + row_off[:, None]).astype(jnp.int32).reshape(-1)
    return pos, (row_off[-1] + row_tot[-1]).astype(jnp.int32)

def compact_scatter(fl, pay):
    pos, total = positions(fl)
    dest = jnp.where(fl, pos, CAP)
    return jnp.zeros(CAP, jnp.int32).at[dest].set(pay, mode="drop")

def compact_matmul(fl, pay):
    rows = N // 512
    f = fl.reshape(rows, 512).astype(jnp.float32)
    incl = jnp.dot(f, tri, preferred_element_type=jnp.float32)
    loc = incl - f                      # exclusive local position [rows,512]
    cnt_b = incl[:, -1]
    block_off = (jnp.cumsum(cnt_b) - cnt_b)  # f32 exact < 2^24
    # local compaction: out_local[b, j] = sum_i pay[b,i] * (f & loc==j)
    oh = jnp.where(fl.reshape(rows, 512)[:, :, None], (loc[:, :, None] == iota512[None, None, :]).astype(jnp.float32), 0.0)
    src = pay.reshape(rows, 512).astype(jnp.float32)
    out_local = jax.lax.dot_general(src[:, None, :], oh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)[:, 0, :]
    # stitch: block of output slot j = #starts <= j - 1
    offs_i = block_off.astype(jnp.int32)
    marks = jnp.zeros(CAP, jnp.float32).at[jnp.minimum(offs_i, CAP)].add(1.0, mode="drop")
    mprefix = positions(jnp.ones(CAP, dtype=bool))[0]  # dummy warm; real prefix below
    mp = marks.reshape(-1, 512)
    incl_m = jnp.dot(mp, tri, preferred_element_type=jnp.float32)
    row_tot = incl_m[:, -1]
    row_off = jnp.cumsum(row_tot) - row_tot
    b_of_j = (incl_m + row_off[:, None]).reshape(-1).astype(jnp.int32) - 1  # inclusive count - 1
    col = jnp.arange(CAP, dtype=jnp.int32) - jnp.take(offs_i, jnp.clip(b_of_j, 0, rows - 1))
    g = jnp.clip(b_of_j, 0, rows - 1) * 512 + jnp.clip(col, 0, 511)
    out = jnp.take(out_local.reshape(-1), g).astype(jnp.int32)
    total = (jnp.sum(cnt_b)).astype(jnp.int32)
    live = jnp.arange(CAP, dtype=jnp.int32) < total
    return jnp.where(live, out, 0)

# correctness
a = np.asarray(jax.jit(compact_scatter)(fl0, payload))
b = np.asarray(jax.jit(compact_matmul)(fl0, payload))
tot = int(fl_np.sum())
print("match:", (a[:min(tot,CAP)] == b[:min(tot,CAP)]).all(), "total:", tot)

def scan_op(op, carry0, L):
    @jax.jit
    def run():
        def body(c, _):
            return op(c), None
        return lax.scan(body, carry0, None, length=L)[0]
    return run
def slope(name, op, carry0, l1=8, l2=72):
    f1, f2 = scan_op(op, carry0, l1), scan_op(op, carry0, l2)
    for f in (f1, f2): f().block_until_ready()
    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.monotonic()
            for _ in range(8): out = f()
            out.block_until_ready()
            best = min(best, (time.monotonic()-t0)/8)
        return best
    per = (t(f2)-t(f1))/(l2-l1)
    print(f"{name:24s} {per*1e6:8.1f} us/step  {per/CAP*1e9:5.1f} ns/slot")

# carry payload-ish vector through
slope("scatter", lambda c: jnp.tile(compact_scatter(fl0, c[:N] ^ 1), E)[:N] ^ jnp.tile(jnp.zeros(CAP, jnp.int32), E), jnp.tile(payload, 1))
slope("matmul", lambda c: jnp.tile(compact_matmul(fl0, c[:N] ^ 1), E)[:N], jnp.tile(payload, 1))
