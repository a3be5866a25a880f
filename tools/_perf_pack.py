"""Microbench + exactness check: complex64-packed pair gather vs 2 int32 takes.

A take's cost is per-row latency-bound, so gathering 8B rows should cost
about the same as 4B rows — packing two int32 fields into one complex64
element should nearly halve the per-column take count in the engine step.
Must be bit-exact for arbitrary int32 payloads (incl. NaN bit patterns)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

CAP = 65536
rng = np.random.default_rng(0)
a_np = rng.integers(-(2**31), 2**31, size=CAP, dtype=np.int64).astype(np.int32)
b_np = rng.integers(-(2**31), 2**31, size=CAP, dtype=np.int64).astype(np.int32)
# force some NaN/Inf f32 payloads
a_np[:100] = np.int32(0x7FC00001)  # NaN payload
b_np[:100] = np.int32(0x7F800000)  # +Inf
a = jnp.asarray(a_np)
b = jnp.asarray(b_np)
idx = jnp.asarray(rng.integers(0, CAP, size=CAP).astype(np.int32))


def pack(x, y):
    return lax.complex(
        lax.bitcast_convert_type(x, jnp.float32),
        lax.bitcast_convert_type(y, jnp.float32),
    )


def unpack(c):
    return (
        lax.bitcast_convert_type(lax.real(c), jnp.int32),
        lax.bitcast_convert_type(lax.imag(c), jnp.int32),
    )


def two_takes(a, b, i):
    return jnp.take(a, i), jnp.take(b, i)


def packed_take(c, i):
    return unpack(jnp.take(c, i))


def bench(name, fn, *args, reps=50):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:24s} {(time.monotonic() - t0) / reps * 1e3:8.3f} ms")


def main():
    print(f"# devices: {jax.devices()}")
    c = jax.jit(pack)(a, b)
    # exactness: jit vs disable_jit and vs numpy reference
    ga, gb = jax.jit(packed_take)(c, idx)
    ra, rb = a_np[np.asarray(idx)], b_np[np.asarray(idx)]
    ok = (np.asarray(ga) == ra).all() and (np.asarray(gb) == rb).all()
    print(f"# packed gather bit-exact vs numpy: {ok}")
    with jax.disable_jit():
        ga2, gb2 = packed_take(pack(a, b), idx)
    ok2 = (np.asarray(ga2) == ra).all() and (np.asarray(gb2) == rb).all()
    print(f"# nojit bit-exact: {ok2}")

    bench("two_int32_takes", two_takes, a, b, idx)
    bench("packed_c64_take", packed_take, c, idx)
    bench("pack_cost", pack, a, b)
    # fused: pack+take+unpack (what the engine would do if packing per-step)
    bench("pack_take_unpack", lambda x, y, i: packed_take(pack(x, y), i), a, b, idx)


if __name__ == "__main__":
    main()


def rowgather2(mat, i):
    return jnp.take(mat, i, axis=0)


def main2():
    mat = jnp.stack([a, b], axis=1)  # [N, 2]
    g = jax.jit(rowgather2)(mat, idx)
    ra, rb = a_np[np.asarray(idx)], b_np[np.asarray(idx)]
    ok = (np.asarray(g[:, 0]) == ra).all() and (np.asarray(g[:, 1]) == rb).all()
    print(f"# rowgather2 bit-exact: {ok}")
    bench("rowgather_N2", rowgather2, mat, idx)
    mat4 = jnp.stack([a, b, a, b], axis=1)
    bench("rowgather_N4", rowgather2, mat4, idx)
    g4 = jax.jit(rowgather2)(mat4, idx)
    ok4 = all((np.asarray(g4[:, j]) == (ra if j % 2 == 0 else rb)).all() for j in range(4))
    print(f"# rowgather4 bit-exact: {ok4}")


main2()
