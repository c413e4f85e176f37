"""Exactness tests for the gather-free in-tile compaction network
(ops/compaction.py) — the routing that makes per-lane mesh candidacy
exploitable on a lockstep machine (no Mosaic per-lane gather).

Run as a pallas_call in interpret mode so CI covers the same code the
TPU kernels run; tools/tpu_validate_compaction.py runs the identical
checks compiled on hardware (Mosaic bugs do not reproduce in
interpret mode — CLAUDE.md)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from project3_cuda_path_tracer_tpu.ops.compaction import (
    compact_tile,
    expand_tile,
)

ROWS, LANE = 64, 128


def _roundtrip(mask, arrays, interpret=True):
    """pallas_call: compact 3 payload arrays, expand 2 result arrays
    derived from the packed data (results = packed values transformed),
    and emit (packed..., total, expanded...)."""
    n = len(arrays)

    def kernel(mask_ref, *refs):
        in_refs = refs[:n]
        packed_refs = refs[n : 2 * n]
        total_ref = refs[2 * n]
        exp_refs = refs[2 * n + 1 :]
        mask = mask_ref[:] > 0
        arrs = [r[:] for r in in_refs]
        packed, pmask, total = compact_tile(mask, arrs)
        for pr, p in zip(packed_refs, packed):
            pr[:] = p
        total_ref[:] = jnp.full((1, 1), total, jnp.int32)
        # pretend the packed values were processed (x2+1 on valid slots)
        results = [jnp.where(pmask, 2.0 * p + 1.0, 0.0) for p in packed]
        out = expand_tile(mask, results)
        for er, e in zip(exp_refs, out):
            er[:] = e

    shape = jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        out_shape=[shape] * n
        + [jax.ShapeDtypeStruct((1, 1), jnp.int32)]
        + [shape] * n,
        interpret=interpret,
    )(mask.astype(jnp.int32), *arrays)
    return outs[:n], outs[n], outs[n + 1 :]


def _reference(mask_np, arrays_np):
    flat_mask = mask_np.reshape(-1)
    idx = np.nonzero(flat_mask)[0]
    packed = []
    for a in arrays_np:
        p = np.zeros(ROWS * LANE, np.float32)
        p[: len(idx)] = a.reshape(-1)[idx]
        packed.append(p.reshape(ROWS, LANE))
    return packed, len(idx)


@pytest.mark.parametrize("density", [0.0, 0.03, 0.08, 0.5, 1.0])
def test_compact_expand_roundtrip(density):
    rng = np.random.default_rng(int(density * 1000) + 7)
    mask_np = rng.random((ROWS, LANE)) < density
    if density == 1.0:
        mask_np[:] = True
    arrays_np = [
        rng.standard_normal((ROWS, LANE)).astype(np.float32) for _ in range(3)
    ]
    packed, total, expanded = _roundtrip(
        jnp.asarray(mask_np), [jnp.asarray(a) for a in arrays_np]
    )
    ref_packed, ref_total = _reference(mask_np, arrays_np)
    assert int(total[0, 0]) == ref_total
    for p, rp in zip(packed, ref_packed):
        np.testing.assert_array_equal(np.asarray(p), rp, err_msg="packed")
    for e, a in zip(expanded, arrays_np):
        want = np.where(mask_np, 2.0 * a + 1.0, 0.0)
        np.testing.assert_array_equal(np.asarray(e), want, err_msg="expanded")


def test_single_candidate_corners():
    """One candidate at each extreme position routes exactly."""
    for pos in [0, LANE - 1, (ROWS - 1) * LANE, ROWS * LANE - 1, 129, 4097]:
        mask_np = np.zeros((ROWS, LANE), bool)
        mask_np.reshape(-1)[pos] = True
        a = np.arange(ROWS * LANE, dtype=np.float32).reshape(ROWS, LANE)
        packed, total, expanded = _roundtrip(jnp.asarray(mask_np), [jnp.asarray(a)])
        assert int(total[0, 0]) == 1
        assert float(np.asarray(packed[0])[0, 0]) == float(pos)
        want = np.where(mask_np, 2.0 * a + 1.0, 0.0)
        np.testing.assert_array_equal(np.asarray(expanded[0]), want)


def test_full_rows_and_empty_rows():
    """Alternating full/empty rows exercises the wrap-free fast paths
    and row-offset multiples of 128."""
    mask_np = np.zeros((ROWS, LANE), bool)
    mask_np[::2] = True
    a = np.arange(ROWS * LANE, dtype=np.float32).reshape(ROWS, LANE)
    packed, total, expanded = _roundtrip(jnp.asarray(mask_np), [jnp.asarray(a)])
    ref_packed, ref_total = _reference(mask_np, [a])
    assert int(total[0, 0]) == ref_total
    np.testing.assert_array_equal(np.asarray(packed[0]), ref_packed[0])
