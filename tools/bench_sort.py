"""Microbench: lax.sort operand-count vs byte-count cost on TPU.

The sorted big-mesh path is sort-movement-bound (sort1 payloads 32.0 +
sort2 26.2 of a 134.3 ms mesh_big frame — tools/breakdown_bigmesh.py,
round 4). Measured sort throughput is ~83 GB/s, far under HBM speed,
suggesting per-OPERAND overhead (pass setup / fusion boundaries)
rather than bandwidth dominates. If s64 payloads move at < 2x the s32
cost, packing f32 payload PAIRS into s64 (bitcast - exact) halves the
operand count of both sorts.

Also times the key-only packed sort (sort1's floor) and a stable
two-key variant for reference.

Usage: python tools/bench_sort.py [n_elements]
ONE TPU process at a time (CLAUDE.md).
"""
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)  # s64 operands are the point
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
REPS = 20


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0].astype(jnp.float32)))  # tunnel flush
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    float(jnp.sum(out[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**28, N, dtype=np.int32))
    pf = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(6)]

    def pack_pairs(a, b):
        ua = a.view(np.uint32).astype(np.uint64)
        ub = b.view(np.uint32).astype(np.uint64)
        return jnp.asarray((ua << np.uint64(32)) | ub)

    p64 = [
        pack_pairs(np.asarray(pf[2 * i]), np.asarray(pf[2 * i + 1]))
        for i in range(3)
    ]

    timed("key-only (1 x s32, unstable)",
          lambda k: lax_sort([k], 1, False), key)
    timed("key + 6 f32 (sort1 shape, unstable)",
          lambda k, *p: lax_sort([k, *p], 1, False), key, *pf)
    timed("key + 3 s64-packed (sort1 packed)",
          lambda k, *p: lax_sort([k, *p], 1, False), key, *p64)
    timed("key + 4 f32 (sort2 shape, unstable)",
          lambda k, *p: lax_sort([k, *p], 1, False), key, *pf[:4])
    timed("key + 2 s64-packed (sort2 packed)",
          lambda k, *p: lax_sort([k, *p], 1, False), key, *p64[:2])
    timed("key + 1 f32", lambda k, p: lax_sort([k, p], 1, False),
          key, pf[0])
    timed("key + 2 f32", lambda k, *p: lax_sort([k, *p], 1, False),
          key, *pf[:2])
    timed("s64 key alone (unstable)",
          lambda k: lax_sort([k], 1, False),
          key.astype(jnp.int64) if jax.config.jax_enable_x64
          else p64[0])
    # roundtrip exactness of the pair packing
    a, b = pf[0], pf[1]
    pk = p64[0]
    hi = jnp.right_shift(pk, np.uint64(32)).astype(jnp.uint32)
    lo = (pk & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    ra = jax.lax.bitcast_convert_type(hi, jnp.float32)
    rb = jax.lax.bitcast_convert_type(lo, jnp.float32)
    da = float(jnp.max(jnp.abs(ra - a)))
    db = float(jnp.max(jnp.abs(rb - b)))
    print(f"pack/unpack roundtrip: max|da|={da} max|db|={db}", flush=True)


def lax_sort(ops, num_keys, stable):
    from jax import lax
    return lax.sort(ops, num_keys=num_keys, is_stable=stable)


if __name__ == "__main__":
    main()


def composite():
    """End-to-end: pack + sort + unpack vs plain 7-operand sort —
    the pipeline-shaped comparison (the plain sort needs no pack)."""
    import numpy as np
    from jax import lax
    rng = np.random.default_rng(1)
    key = jnp.asarray(rng.integers(0, 100, N, dtype=np.int32))
    idx = jnp.arange(N, dtype=jnp.int32)
    pf = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(6)]

    def plain(k, i, *p):
        s = lax.sort([k * jnp.int32(N) + i, *p], num_keys=1,
                     is_stable=False)
        return (s[0] // N, s[0] % N, *s[1:])

    def pk2(a, b):
        ua = lax.bitcast_convert_type(a, jnp.uint32).astype(jnp.uint64)
        ub = lax.bitcast_convert_type(b, jnp.uint32).astype(jnp.uint64)
        return (ua << jnp.uint64(32)) | ub

    def up2(p):
        hi = (p >> jnp.uint64(32)).astype(jnp.uint32)
        lo = (p & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        return (lax.bitcast_convert_type(hi, jnp.float32),
                lax.bitcast_convert_type(lo, jnp.float32))

    def packed(k, i, *p):
        k64 = (k.astype(jnp.uint64) << jnp.uint64(32)) | i.astype(
            jnp.uint64)
        s = lax.sort([k64, pk2(p[0], p[1]), pk2(p[2], p[3]),
                      pk2(p[4], p[5])], num_keys=1, is_stable=False)
        a, b = up2(s[1]); c, d = up2(s[2]); e, f = up2(s[3])
        return ((s[0] >> jnp.uint64(32)).astype(jnp.int32),
                (s[0] & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32),
                a, b, c, d, e, f)

    timed("composite plain s32key + 6 f32", plain, key, idx, *pf)
    timed("composite u64 pack+sort+unpack", packed, key, idx, *pf)


if __name__ == "__main__" and os.environ.get("BS_COMPOSITE"):
    composite()
