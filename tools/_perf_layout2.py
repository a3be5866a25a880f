import jax, jax.numpy as jnp, numpy as np, time
from jax import lax
W = 2_500_000
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, W*32, size=57344).astype(np.int32))  # bit positions
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
    print(f"{name:30s} {per*1e6:8.1f} us/step  {per/57344*1e9:5.1f} ns/row")

for FOLD in (4, 8, 16, 32):
    Wf = W // FOLD + 1
    tbl = jax.device_put(rng.integers(0, 2**31, size=(Wf, 12*FOLD), dtype=np.int32))
    def full_rank(c, tbl=tbl, FOLD=FOLD):
        word = (c >> 5) % W
        r = jnp.take(tbl, word // FOLD, axis=0)          # [n, 12*FOLD]
        grp = (word % FOLD)[:, None]
        lane = lax.broadcasted_iota(jnp.int32, (1, 12*FOLD), 1) // 12
        masked = jnp.where(lane == grp, r, 0)            # [n, 12*FOLD]
        row = masked[:, :12]
        for g in range(1, FOLD):
            row = row + masked[:, g*12:(g+1)*12]         # [n, 12]
        ckpt = row[:, :6]
        bits = lax.bitcast_convert_type(row[:, 6:], jnp.uint32)
        off = (c & 31).astype(jnp.uint32)
        mask = (jnp.uint32(1) << off) - jnp.uint32(1)
        cnt = lax.population_count(bits & mask[:, None])
        rr = ckpt + lax.bitcast_convert_type(cnt, jnp.int32)
        return c + rr.sum(axis=1)
    slope(f"full_rank_fold{FOLD}", full_rank, idx)
