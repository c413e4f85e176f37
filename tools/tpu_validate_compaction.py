"""Hardware validation of ops/compaction.py: the exact checks of
tests/test_compaction.py, compiled by Mosaic on the real TPU.

Run after ANY change to the compaction network (CLAUDE.md: Mosaic bugs
do not reproduce in interpret mode)."""

import sys

sys.path.insert(0, "/root/repo")

import importlib

import numpy as np
import jax.numpy as jnp

tc = importlib.import_module("tests.test_compaction")

ok = True
for density in [0.0, 0.03, 0.08, 0.5, 1.0]:
    rng = np.random.default_rng(int(density * 1000) + 7)
    mask_np = rng.random((tc.ROWS, tc.LANE)) < density
    if density == 1.0:
        mask_np[:] = True
    arrays_np = [
        rng.standard_normal((tc.ROWS, tc.LANE)).astype(np.float32)
        for _ in range(3)
    ]
    packed, total, expanded = tc._roundtrip(
        jnp.asarray(mask_np), [jnp.asarray(a) for a in arrays_np],
        interpret=False,
    )
    ref_packed, ref_total = tc._reference(mask_np, arrays_np)
    d_ok = int(total[0, 0]) == ref_total
    for p, rp in zip(packed, ref_packed):
        d_ok &= bool((np.asarray(p) == rp).all())
    for e, a in zip(expanded, arrays_np):
        want = np.where(mask_np, 2.0 * a + 1.0, 0.0)
        d_ok &= bool((np.asarray(e) == want).all())
    print(f"density {density}: {'OK' if d_ok else 'FAIL'}", flush=True)
    ok &= d_ok

for pos in [0, tc.LANE - 1, (tc.ROWS - 1) * tc.LANE, tc.ROWS * tc.LANE - 1, 129]:
    mask_np = np.zeros((tc.ROWS, tc.LANE), bool)
    mask_np.reshape(-1)[pos] = True
    a = np.arange(tc.ROWS * tc.LANE, dtype=np.float32).reshape(tc.ROWS, tc.LANE)
    packed, total, expanded = tc._roundtrip(
        jnp.asarray(mask_np), [jnp.asarray(a)], interpret=False
    )
    p_ok = (
        int(total[0, 0]) == 1
        and float(np.asarray(packed[0])[0, 0]) == float(pos)
        and bool(
            (np.asarray(expanded[0]) == np.where(mask_np, 2 * a + 1, 0)).all()
        )
    )
    print(f"pos {pos}: {'OK' if p_ok else 'FAIL'}", flush=True)
    ok &= p_ok

tr = importlib.import_module("tests.test_radix")
for n_keys, bits in [(50, 6), (80, 7), (3, 2)]:
    rng = np.random.default_rng(n_keys)
    keys_np = rng.integers(0, n_keys + 1, (tr.ROWS, tr.LANE)).astype(
        np.float32
    )
    arrays_np = [
        rng.standard_normal((tr.ROWS, tr.LANE)).astype(np.float32)
        for _ in range(3)
    ]
    key_sorted, sorted_arrays, unsorted = tr._sort_roundtrip(
        jnp.asarray(keys_np), [jnp.asarray(a) for a in arrays_np], bits,
        interpret=False,
    )
    perm = np.argsort(keys_np.reshape(-1), kind="stable")
    r_ok = bool(
        (np.asarray(key_sorted).reshape(-1) == keys_np.reshape(-1)[perm])
        .all()
    )
    for got, src in zip(sorted_arrays, arrays_np):
        r_ok &= bool(
            (np.asarray(got).reshape(-1) == src.reshape(-1)[perm]).all()
        )
    for got, src in zip(unsorted, arrays_np):
        r_ok &= bool((np.asarray(got) == src).all())
    print(f"radix {n_keys} keys/{bits} bits: {'OK' if r_ok else 'FAIL'}",
          flush=True)
    ok &= r_ok

print("ALL OK" if ok else "FAILURES", flush=True)
sys.exit(0 if ok else 1)
