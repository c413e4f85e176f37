"""Gather-free in-tile stream compaction for Pallas TPU kernels.

Why this exists (measured, round 3): per-lane mesh-AABB candidacy on a
diffuse bounce is 4-12%, but the union over ANY >=128-lane block is
~99-100% — so tile/row/block-granular `any()` culling can never skip
mesh work after bounce 0 (docs/ANALYSIS.md "Mesh candidacy"). The only
winning shape is to COMPACT the ~8% candidate lanes into dense
(8,128) groups and sweep just those. XLA gather/scatter can't do it:
a compaction-shaped `jnp.take` of 7 pool arrays measures 11 ms on the
TPU (~0.2 GB/s — arbitrary per-lane data movement is the enemy, see
docs/ANALYSIS.md "Stream compaction"). Mosaic has no per-lane gather
either. What the VPU *does* have: static lane rolls, per-row dynamic
rolls (pltpu.roll), selects, and exact 0/1 f32 matmuls on the MXU.

This module routes lanes with exactly those primitives — the CUDA
warp-compaction idiom rebuilt for a 64x128 vector tile:

  1. in-row left-pack: the classic log-shift network. Candidate at
     lane i moves left by s = i - dest (dest = in-row exclusive prefix
     count); 7 steps, step k rolls the row left by 2^k and per-lane
     selects the arrivals (bit k of the remaining shift). Monotone
     routing => no collisions (tested exhaustively).
  2. per-row rotate right by O_r % 128 (O_r = exclusive prefix over
     rows of the row counts): 7 select-between-rolled steps keyed on
     the bits of the per-row amount — an arbitrary per-row rotate
     from static rolls.
  3. row scatter: packed row r contributes its non-wrapped lanes to
     output row O_r//128 and its wrapped lanes to O_r//128+1. Both
     routes are 0/1 (64,64) matrices applied with an exact f32 matmul
     (precision=HIGHEST; one nonzero per output slot => sums exact).

  Expansion (scatter-back) is the exact inverse: transposed matmuls,
  inverse per-row rotate, and the in-row network run backwards using
  step masks re-simulated from the (recomputed) prefix state.

Everything is closed-form from `mask` — the expansion side recomputes
the same routing without any saved state beyond the mask itself.

No counterpart in the reference (its compaction is
thrust::stable_partition, src/pathtrace.cu:313-317, a scan+scatter
over global memory); this is the TPU-native replacement that runs
inside a kernel at VPU speed: ~30 vector ops per payload array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_BITS = 7  # log2(LANE)


def _roll_left(x, k):
    """Static left-rotate along lanes by k (elements move to lower lanes)."""
    return pltpu.roll(x, LANE - k, axis=1)


def _roll_right(x, k):
    return pltpu.roll(x, k, axis=1)


def _cumsum_lanes(x):
    """Inclusive prefix sum along lanes (Hillis-Steele log-scan; Mosaic
    has no cumsum lowering)."""
    rows = x.shape[0]
    lane_iota = lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    for k in range(_BITS):
        sh = 1 << k
        x = x + jnp.where(lane_iota >= sh, _roll_right(x, sh), 0)
    return x


def _cumsum_rows(x):
    """Inclusive prefix sum along the sublane axis of (rows, C)."""
    rows, c = x.shape
    row_iota = lax.broadcasted_iota(jnp.int32, (rows, c), 0)
    k = 1
    while k < rows:
        x = x + jnp.where(row_iota >= k, pltpu.roll(x, k, axis=0), 0)
        k *= 2
    return x


def _row_prefix(mask_i32):
    """(rows,128) 0/1 -> (dest, counts): in-row EXCLUSIVE prefix and
    per-row totals (rows,1)."""
    cs = _cumsum_lanes(mask_i32)
    return cs - mask_i32, cs[:, LANE - 1 :]


def _sim_steps(mask_i32):
    """Re-simulate the in-row network on (occupancy, shift) state only.

    Returns the 7 per-step `arrive` masks (int32 (rows,128)) consumed by
    both the forward payload routing and its inverse."""
    rows = mask_i32.shape[0]
    lane_iota = lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    dest, _ = _row_prefix(mask_i32)
    s = jnp.where(mask_i32 > 0, lane_iota - dest, 0)
    m = mask_i32
    arrives = []
    for k in range(_BITS):
        bit = jnp.int32(1 << k)
        s_roll = _roll_left(s, 1 << k)
        m_roll = _roll_left(m, 1 << k)
        arrive = (m_roll > 0) & ((s_roll & bit) > 0)
        stay = (m > 0) & ((s & bit) == 0)
        s = jnp.where(arrive, s_roll, s)
        m = (arrive | stay).astype(jnp.int32)
        arrives.append(arrive)
    return arrives


def _apply_forward(x, arrives):
    for k, arrive in enumerate(arrives):
        x = jnp.where(arrive, _roll_left(x, 1 << k), x)
    return x


def _apply_inverse(x, arrives):
    for k in reversed(range(_BITS)):
        x = jnp.where(_roll_right(arrives[k].astype(jnp.int32), 1 << k) > 0,
                      _roll_right(x, 1 << k), x)
    return x


def _rotate_rows_right(x, amount):
    """Rotate each row right by its own amount (rows,1) in [0,128)."""
    for k in range(_BITS):
        bit = jnp.int32(1 << k)
        x = jnp.where((amount & bit) > 0, _roll_right(x, 1 << k), x)
    return x


def _rotate_rows_left(x, amount):
    for k in range(_BITS):
        bit = jnp.int32(1 << k)
        x = jnp.where((amount & bit) > 0, _roll_left(x, 1 << k), x)
    return x


def _routing(mask):
    """All mask-derived routing state shared by compact/expand."""
    rows = mask.shape[0]
    mask_i32 = mask.astype(jnp.int32)
    arrives = _sim_steps(mask_i32)
    _, counts = _row_prefix(mask_i32)  # (rows,1)
    offs = _cumsum_rows(counts) - counts  # exclusive row offsets
    total = offs[rows - 1, 0] + counts[rows - 1, 0]
    rot = offs % LANE  # per-row right-rotate amount (rows,1)
    qa = offs // LANE  # destination output row of the non-wrapped part
    lane_iota = lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    # occupancy AFTER in-row pack (left-packed): lane < count
    packed_occ = lane_iota < counts
    # occupancy after per-row rotate: candidates sit in [rot, rot+count) mod 128
    rot_occ = _rotate_rows_right(packed_occ.astype(jnp.int32), rot) > 0
    non_wrapped = rot_occ & (lane_iota >= rot)
    wrapped = rot_occ & (lane_iota < rot)
    # 0/1 routing matrices (out_row, in_row)
    row_iota_o = lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    row_iota_i = lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    qa_t = qa.reshape(1, rows)  # qa indexed by in_row
    mat_a = (row_iota_o == qa_t).astype(jnp.float32)
    mat_b = (row_iota_o == qa_t + 1).astype(jnp.float32)
    del row_iota_i
    return dict(arrives=arrives, rot=rot, mat_a=mat_a, mat_b=mat_b,
                non_wrapped=non_wrapped, wrapped=wrapped, total=total)


def _exact_mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def make_routing(mask):
    """Precompute the mask-derived routing state so one computation
    serves both compact_tile and expand_tile (they are exact inverses
    over the same mask)."""
    return _routing(mask)


def compact_tile(mask, arrays, routing=None):
    """Pack candidate lanes of (rows,128) f32 arrays to the front.

    mask: (rows,128) bool candidacy. arrays: list of (rows,128) f32.
    Returns (packed_arrays, packed_mask, total) where packed_arrays[i]
    holds the candidates' values densely in row-major order (row 0
    lanes 0.. first), packed_mask marks the valid region, and total is
    the scalar candidate count. Non-candidate slots are zero.
    """
    r = routing if routing is not None else _routing(mask)
    outs = []
    for x in arrays:
        x = _apply_forward(x, r["arrives"])
        x = _rotate_rows_right(x, r["rot"])
        xa = jnp.where(r["non_wrapped"], x, 0.0)
        xb = jnp.where(r["wrapped"], x, 0.0)
        outs.append(_exact_mm(r["mat_a"], xa) + _exact_mm(r["mat_b"], xb))
    rows = mask.shape[0]
    flat_iota = (
        lax.broadcasted_iota(jnp.int32, (rows, LANE), 0) * LANE
        + lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    )
    packed_mask = flat_iota < r["total"]
    return outs, packed_mask, r["total"]


def expand_tile(mask, packed_arrays, routing=None):
    """Inverse of compact_tile: route packed values back to the original
    candidate lanes. Non-candidate lanes get zeros (mask with `mask`)."""
    r = routing if routing is not None else _routing(mask)
    outs = []
    at = r["mat_a"].T
    bt = r["mat_b"].T
    for y in packed_arrays:
        xa = _exact_mm(at, y)
        xb = _exact_mm(bt, y)
        x = jnp.where(r["non_wrapped"], xa, jnp.where(r["wrapped"], xb, 0.0))
        x = _rotate_rows_left(x, r["rot"])
        x = _apply_inverse(x, r["arrives"])
        outs.append(jnp.where(mask, x, 0.0))
    return outs
