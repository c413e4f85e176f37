"""Per-bounce globally-compacted mesh pipeline: K1 pack -> K2 dense
sweep -> K3 merge+shade (or merge-only, for the intersect entry).

Why a third mesh architecture (after the round-2 tile-synchronous sweep
and the round-3 in-tile compaction): per-lane mesh candidacy on diffuse
bounces is 2-7% (docs/ANALYSIS.md "Mesh candidacy"), but in-TILE
compaction still sweeps ceil(count/1024) groups per tile — at counts of
200-900 that is one (8,128) group at 22-60% occupancy, and the sweep's
fixed costs (chunk loop, scalar broadcasts, select-chain latency) stop
amortizing at (8,128) granularity: measured 190-220 us per group vs the
~88 us pure-vector floor. This pipeline compacts candidates across the
WHOLE POOL instead:

  K1 (grid over pool tiles): analytic intersect (cube/sphere), per-lane
     mesh candidacy seeded by the analytic hit, in-tile compaction
     (ops/compaction.py) of the 2-7% candidate WORLD rays into the
     tile's region of a packed buffer + per-tile counts.
  glue (XLA, ~79 elements): exclusive cumsum of counts -> global
     offsets, total, number of dense tiles.
  K2 (grid over dense tiles): stitch the per-tile packed prefixes into
     FULL (64,128) tiles lane-exactly (DMA each overlapping region +
     circular stream shift + masked merge — no gather), then run the
     hierarchical mesh sweep at full (64,128) width: fixed costs
     amortize over 8192 lanes again, select chains pipeline at native
     ILP, and occupancy is ~100% (one partial tile per bounce, not one
     per pool tile).
  K3 (grid over pool tiles): recompute the candidacy mask + routing
     (bit-identical to K1 — cheaper than storing it), DMA the dense
     result window back, inverse-route results to their lanes, merge
     with the analytic hits, and either run the shading half of the
     bounce (megakernel._shade_values) or emit the merged
     Intersections (intersect_pipeline — the TPU-safe intersect that
     lets file-textured / bump / SSS / env-map / sorted mesh renders
     keep their XLA shading without the worker-crashing XLA mesh
     sweep).

Measured (TPU v5e, 800x800 d8): mesh.txt 5,120 tris 144.3 Mrays/s
(round-2 tile-synchronous: 12.9; in-tile compaction: 44).

The reference's wavefront pathtracer reaches the same shape with
thrust::partition between kernel stages (src/pathtrace.cu:313-317);
this is that idea rebuilt for a machine with no scatter/gather, where
the partition itself must be a roll-and-matmul routing network.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene import GeomType
from .compaction import compact_tile, expand_tile, make_routing
from .megakernel import (
    FLT_MAX,
    LANE,
    _draw_slots,
    _intersect_all,
    _mesh_candidacy,
    _mesh_epilogue,
    _mesh_meta,
    _mesh_sweep_block,
    _pack_env_atlas,
    _pack_scene_tables,
    _pack_tex_atlases,
    _shade_values,
    checker_only,
)
from .vec import Vec3

TILE_ROWS = 64  # pool tile height; the pipeline requires P % 8192 == 0
TILE_LANES = TILE_ROWS * LANE
# K3's dense-result window: a tile's candidates span < 64 rows + up to
# one row of lane phase -> 65 rows; DMA a fixed 72-row (9-block) window.
WIN_ROWS = 72
# The chunk/super AABB tables stay VMEM-resident ((C,8) rows lane-pad
# to 512 B each): ~400k tris = 12.5k chunks = 6.4 MB is the practical
# ceiling of the streamed path.
MAX_PIPE_TRIS = 400_000
# Supernode-major group-conditional sweep threshold. MEASURED NEGATIVE
# (round 3, docs/ANALYSIS.md "Big-mesh sweeps"): per-(8,128)-group super
# conds regressed mesh_big 9.4 -> 4.4 and bunny 9.8 -> 5.6 Mrays/s —
# even source-tile-ordered groups see most supernodes of a self-occluding
# mesh, so the conds rarely skip and the group-granular fixed costs
# dominate. Disabled by default (the env knob keeps the experiment
# reproducible); real big-mesh gains need ray REORDERING by supernode
# (docs/ROADMAP.md round-4 plan).
GROUP_SUPER_MIN_TRIS = int(
    __import__("os").environ.get("PT_TPU_GROUP_SUPER_MIN", str(2**31))
)
# Sorted-stream threshold (the big-mesh accelerator): geoms over this
# many tris take the XLA-orchestrated sorted-stream sweep — the dense
# candidate stream is globally multisorted by each lane's first-entered
# supernode key (lax.sort moves payloads through its network
# gather-free: 4.5 ms for 8 x 640k operands on v5e, vs ~10 ms for ONE
# 640k XLA gather), and a per-SUPERNODE Pallas kernel sweeps only each
# super's contiguous row window. FOUR measured negatives bound the
# design space (docs/ANALYSIS.md "Big-mesh sweeps"): geometric
# group-granular conds saturate unsorted (9.4 -> 4.4 Mrays/s on
# mesh_big) AND sorted-by-first-super (-> 5.1) because rays pass
# THROUGH most supers' slabs; per-pass IN-TILE radix re-sorting (the
# ftb sweep) was bit-exact but paid 2x (9.3 -> 5.2: ~170
# routing-network applications per pass swamp the sweep savings); and
# the fused in-kernel continuation scan over [s+1, blockmax] (this
# file's _window_sweep) is bit-exact but union-granular — the
# entered-union of a first-super-sorted 1024-lane block is 45/50
# supers (per-lane mean 2.5), so it sweeps nearly everything and
# measured 9.4 -> 5.3. The per-lane-exact PAIR EXPANSION (one stream
# entry per (lane, entered super), _super_rank_xla) is what finally
# won: mesh_big 9.4 -> 33.2 Mrays/s at E=6 (hardware A/B, bit-exact vs
# dense; docs/ANALYSIS.md "Big-mesh traversal, round 3b"), so sorted
# is now the DEFAULT for geoms above this triangle count. The dense K2
# sweep keeps small/mid meshes (mesh.txt 144.3 Mrays/s) where one
# supernode's worth of culling already fits.
SORT_SUPER_MIN_TRIS = int(
    __import__("os").environ.get("PT_TPU_SORT_SUPER_MIN", "16384")
)
# Entries per lane in the expanded sorted stream (one per entered
# supernode, rank-sliced; lanes entering more overflow to the dense
# tail program). mesh_big per-lane entered distribution: mean 2.5,
# p90 5, max 12. Hardware sweep (800x800 d8, Mrays/s): E=2 11.1,
# E=4 23.3, E=6 33.2, E=8 31.9, E=10 30.5 — low E pays the overflow
# tail (whole-mesh sweeps), high E pays sort size; 6 is the knee.
SORT_EXPAND = int(
    __import__("os").environ.get("PT_TPU_SORT_EXPAND", "6")
)
# TIMING-ONLY stage ablation for the sorted path
# (tools/breakdown_bigmesh.py). Comma flags: norank (fake all-dead
# keys — rank fori DCEs), nosort1 (key-only sort1: real windows,
# payloads left unsorted), nosort2 (skip the unsort), nosweep (skip
# the window kernel). Images are WRONG under any flag; the surviving
# stages keep their real cost because sort networks are
# data-independent and windows still come from the real sorted keys
# (except under norank — pair it with nosweep).
# s64-PACKED sort operands: a measured NEGATIVE, default OFF. At
# small N lax.sort is per-operand overhead bound (480k: key + 6 f32 =
# 5.79 ms vs key + 3 u64 = 2.77), but at bounce-0 scale it is
# bandwidth-bound and u64 words pay 2-word handling (3.84M: 19.55 vs
# 20.16, and pack+sort+unpack composite 23.7 vs 18.2 plain —
# tools/bench_sort.py). Full-pipeline A/B on mesh_big: 133.9 ->
# 138.7 ms/frame (shift-packed; the first mul/div-packed attempt was
# 137.7). Bit-exact both ways (max|d|=0); kept flag-gated for the
# record. Sort-shrink must come from fewer ELEMENTS or linear-pass
# radix partitions, not wider operands (docs/ANALYSIS.md).
SORT_PACK64 = __import__("os").environ.get(
    "PT_TPU_SORT_PACK64", "0") == "1"
# Compacted expansion: drop the dead-sentinel entries (mean real
# entries/lane is 2.5 of E=6 slots) from the expanded stream BEFORE
# the two global sorts, so lax.sort moves ~2x fewer elements — the
# sorts are bandwidth-bound at frame-dominant sizes (tools/
# bench_sort.py), so element count is the lever that pays where
# operand packing measured negative. _kc_compact packs real entries
# per tile, _ks_stitch builds the dense half-size prefix, and
# _kx_expand routes results back to entry-major. Default ON: measured
# 132.8 -> 124.8 ms/frame on mesh_big (41.0 Mrays/s), bit-exact vs the
# dense sweep on hardware (max|d|=0 at 256x256 4spp) — the routing
# kernels cost back ~2/3 of the raw sort saving, so the net is +6%,
# not the naive +25% (docs/ANALYSIS.md "Compacted expansion").
# Requires 2*N_e < 2^24 (flat indices ride the f32 routing network
# exactly); larger pools fall back to the uncompacted path.
SORT_COMPACT = __import__("os").environ.get(
    "PT_TPU_SORT_COMPACT", "1") == "1"
# Global binary-radix sort for the compacted stream (requires
# SORT_COMPACT): replaces BOTH lax.sorts with linear-pass machinery.
# lax.sort is a bitonic network (~150 effective passes over its
# operands at 3.8M elements — tools/bench_sort.py bandwidth math);
# a B-bit stable LSB radix is B x (partition kernel + stitch kernel)
# ~ 4B linear passes, B = bit_length(2*n_supers) = 7-8. Stability
# makes the idx tie-break operand unnecessary (stable radix on key ==
# stable (key, idx) sort), and the unsort needs NO sort at all: each
# bit pass's permutation is inverted exactly by re-deriving its
# routing from the recorded stage keys (_kr_unpartition), the same
# mask-recompute trick K3 uses.
SORT_RADIX = __import__("os").environ.get(
    "PT_TPU_SORT_RADIX", "0") == "1"
# First-super + bounded SPILL split of the sorted stream: phase A
# sweeps ONE entry per lane (its first entered super — no expansion,
# so the phase-A sort moves ~E x fewer elements than the one-round
# stream), then phase B re-ranks ONLY the supers a lane still needs —
# those entered at te < min(bt0, phase-A best t). Exact: a super whose
# slab entry satisfies te >= bound contains no triangle with t < te
# <= the running best, and the phase merge is strict-<, so ties keep
# phase A's LOWER-index super exactly like the dense sweep's in-order
# traversal. mesh_big enters 2.5 supers/lane on average and most hits
# land in the first entered super, so the phase-B stream (and both
# its sorts and its share of the window sweep) is small. Default OFF
# until the hardware A/B lands (CLAUDE.md: no sorted-path change
# ships unmeasured).
SORT_SPILL = __import__("os").environ.get(
    "PT_TPU_SORT_SPILL", "0") == "1"
# Chunk-level AABB culling INSIDE the window sweep: before the 32
# Moller-Trumbore tests of a chunk, slab-test the whole (8,128) entry
# block against the chunk's AABB (vs each lane's RUNNING best t) and
# lax.cond-skip the chunk when no lane can win. Exact for the same
# reason as the expansion's super-level bound (t >= slab tmin >= bt
# and updates are strict-<), and per-chunk skips never change a
# surviving test's result. The round-3 union-granular NEGATIVE was
# measured on UNSORTED streams at supernode grain (union over >=128
# arbitrary lanes fires ~always); a sorted WINDOW block is 1024
# same-super pixel-order entries — a coherent beam whose union
# against a 32-tri chunk box can actually miss. Default OFF until the
# hardware A/B lands (tools/ab_bigmesh.py --cull-ab).
SWEEP_CULL = __import__("os").environ.get(
    "PT_TPU_SWEEP_CULL", "0") == "1"
# Software-pipeline the window sweep's block loop: 3 rotating 8-row
# VMEM slots so block b+1's loads and block b-1's writeback ride the
# DMA engines UNDER block b's 1024 Moller-Trumbore tests, instead of
# the legacy 3 serialized start/wait round-trips per block. Exact by
# construction: in-flight blocks within one window have strictly
# increasing (never aliasing) row ranges — hi_r <= srows//8 by the
# searchsorted/ceil bound, so the legacy clamp row never fired — and
# every writeback drains before the window returns, so cross-window
# reads (tail s2 prefixes, adjacent grid programs' shared boundary
# rows) still see completed updates. Hardware A/B:
# tools/ab_bigmesh.py --pipe-ab.
SWEEP_PIPE = __import__("os").environ.get(
    "PT_TPU_SWEEP_PIPE", "0") == "1"
# Defer the winner's attribute interpolation OUT of the Moller-
# Trumbore loop: the sweep carries (bt, row, pos, u, v) instead of
# folding normals/UVs per triangle (~16-28 of ~75 VPU ops per test),
# then fetches the winning triangle's 9 (15 with UV) attributes once
# per 8-row block via a (192, sup_rows)@(sup_rows, 128) bf16 one-hot
# matmul over the per-super attribute slab (models/device.py
# mesh_attr_slabs) and interpolates with the identical f32
# expression — bit-exact by the _split3_bf16 + one-nonzero-per-slot
# argument (ops/megakernel._attr_fetch). Implemented in the legacy
# block loop only (SWEEP_PIPE measured a wash — ANALYSIS round 5).
# DEFAULT ON since the round-5 hardware A/B (tools/ab_bigmesh.py
# --defer-ab): mesh_big 125.4 -> 92.3 ms/frame (40.8 -> 55.5
# Mrays/s), max|d|=0 vs dense AND vs the inline-fold sorted path.
SWEEP_DEFER = __import__("os").environ.get(
    "PT_TPU_SWEEP_DEFER", "1") == "1"
# PT_TPU_SWEEP_PACKWIN: pack the deferred sweep's (row-in-super,
# row-position) winner carries into ONE f32 word rp = 4*row + pos
# (max 4*248+31 = 1023 << 2^24 — exact integer f32; unpacked by a
# floor/mul at fetch time, so brow/bpos and everything downstream are
# bit-identical). Drops the 32-wide MT unroll from 5 selects per
# triangle to 4; the divide microbench (tools/bench_mt.py) measured
# the 5->4 select cut at +6.5% on the MT loop (the same
# register-pressure lever as the defer win itself). DEFAULT ON since
# the round-5 hardware A/B (tools/ab_bigmesh.py --packwin-ab,
# mesh_big 800x800 d8): 91.1 -> 90.0 ms/frame (56.2 -> 56.9
# Mrays/s), max|d|=0 vs dense AND vs the unpacked sorted leg;
# interpret-mode equivalence is BIT-exact too
# (tests/test_radix.py::test_packwin_bit_identical).
SWEEP_PACKWIN = __import__("os").environ.get(
    "PT_TPU_SWEEP_PACKWIN", "1") == "1"
SORT_ABLATE = frozenset(
    f for f in __import__("os").environ.get(
        "PT_TPU_SORT_ABLATE", "").split(",") if f
)
if SORT_ABLATE:
    # Loud guard: a leaked PT_TPU_SORT_ABLATE silently corrupts every
    # sorted-path image (the probes skip real work). Only the timing
    # harness should ever see this set.
    import sys as _sys

    print(
        "WARNING: PT_TPU_SORT_ABLATE="
        + ",".join(sorted(SORT_ABLATE))
        + " — sorted-path images are WRONG under ablation probes; "
        "unset it unless running tools/breakdown_bigmesh.py",
        file=_sys.stderr,
        flush=True,
    )


def _mesh_sweep_super(tri_src, stream, chunk_ref, super_ref,
                      super_start, n_supers, chunk_start, n_chunks,
                      tri_start, tri_count,
                      q_refs, res_refs, buf, sem, want_uv=False):
    """Supernode-major sweep over one dense (64,128) tile, with
    PER-(8,128)-GROUP supernode conds — the big-mesh accelerator.

    Why it works where tile-level conds saturate: K2 stitches the dense
    stream in source-tile order, so each (8,128) group's 1024 lanes come
    from 1-2 pool tiles of ADJACENT PIXELS. Their ray origins cluster,
    so the set of supernodes their cone toward the mesh can enter is
    small (3-6 of ~50 at 51k tris) and the per-group `any(enter)` cond
    skips the rest — per-lane hierarchical culling recovered at group
    granularity. Iteration order (supers ascending, chunks ascending
    within) matches the chunk-major sweep exactly, so results stay
    bit-identical.

    tri_src: the packed tri table — a VMEM ref when resident, an
    HBM (ANY) ref when stream=True, in which case each fired super's
    SUP_ROWS block is DMA'd into `buf` (128 KB; compute-bound sweep, so
    serial copies are noise). q_refs: 7 VMEM scratch refs pre-loaded
    with (qox,qoy,qoz,qdx,qdy,qdz,bt) for THIS geom; res_refs: 3(+2 uv)
    VMEM scratch refs for the normals (+uv), zero-initialized by the
    caller. Results come back in q_refs[6] (best t) and res_refs."""
    from .megakernel import (
        MESH_CHUNK,
        MESH_CONDS,
        MESH_SUPER,
        TRI_ROW,
        _mt_chunk,
    )

    rows_per_chunk = MESH_CHUNK // TRI_ROW
    sup_rows = MESH_SUPER * rows_per_chunk  # tri-table rows per super
    n_groups = TILE_ROWS // 8

    def super_body(s, _):
        srow = super_ref[pl.ds(super_start + s, 1), :]
        mnx, mny, mnz = srow[0, 0], srow[0, 1], srow[0, 2]
        mxx, mxy, mxz = srow[0, 3], srow[0, 4], srow[0, 5]

        def slab_enter(qox, qoy, qoz, idx_, idy_, idz_, bt):
            t1x = (mnx - qox) * idx_
            t2x = (mxx - qox) * idx_
            t1y = (mny - qoy) * idy_
            t2y = (mxy - qoy) * idy_
            t1z = (mnz - qoz) * idz_
            t2z = (mxz - qoz) * idz_
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            return (tmax >= tmin) & (tmax > 0) & (tmin < bt)

        first_chunk = s * MESH_SUPER
        chunk_count = jnp.minimum(n_chunks - first_chunk, MESH_SUPER)

        # whole-tile entry union gates the (possibly DMA'd) super at all
        tile_q = [r[:] for r in q_refs]
        tile_hit = slab_enter(
            tile_q[0], tile_q[1], tile_q[2],
            1.0 / tile_q[3], 1.0 / tile_q[4], 1.0 / tile_q[5],
            tile_q[6],
        )

        @pl.when(jnp.any(tile_hit))
        def _():
            if stream:
                cp = pltpu.make_async_copy(
                    tri_src.at[
                        pl.ds(
                            tri_start // TRI_ROW + s * sup_rows, sup_rows
                        ),
                        :,
                    ],
                    buf.at[pl.ds(0, sup_rows), :],
                    sem,
                )
                cp.start()
                cp.wait()

            def group_body(g, _):
                sl = pl.ds(g * 8, 8)
                qox, qoy, qoz = (
                    q_refs[0][sl, :], q_refs[1][sl, :], q_refs[2][sl, :]
                )
                qdx, qdy, qdz = (
                    q_refs[3][sl, :], q_refs[4][sl, :], q_refs[5][sl, :]
                )
                bt_g = q_refs[6][sl, :]
                hit_g = slab_enter(
                    qox, qoy, qoz,
                    1.0 / qdx, 1.0 / qdy, 1.0 / qdz, bt_g,
                )

                @pl.when(jnp.any(hit_g))
                def _():
                    carry = (bt_g,) + tuple(r[sl, :] for r in res_refs)

                    def chunk_body(c, carry):
                        cg = first_chunk + c

                        def do_chunk(carry):
                            if stream:
                                blk = buf[
                                    pl.ds(c * rows_per_chunk,
                                          rows_per_chunk), :,
                                ]
                            else:
                                base = (
                                    tri_start // TRI_ROW + s * sup_rows
                                )
                                blk = tri_src[
                                    pl.ds(base + c * rows_per_chunk,
                                          rows_per_chunk), :,
                                ]
                            return _mt_chunk(
                                blk, cg, tri_count,
                                qox, qoy, qoz, qdx, qdy, qdz,
                                carry, want_uv,
                            )

                        if not MESH_CONDS:
                            return do_chunk(carry)
                        crow = chunk_ref[pl.ds(chunk_start + cg, 1), :]
                        cmnx, cmny, cmnz = crow[0, 0], crow[0, 1], crow[0, 2]
                        cmxx, cmxy, cmxz = crow[0, 3], crow[0, 4], crow[0, 5]
                        idx_ = 1.0 / qdx
                        idy_ = 1.0 / qdy
                        idz_ = 1.0 / qdz
                        t1x = (cmnx - qox) * idx_
                        t2x = (cmxx - qox) * idx_
                        t1y = (cmny - qoy) * idy_
                        t2y = (cmxy - qoy) * idy_
                        t1z = (cmnz - qoz) * idz_
                        t2z = (cmxz - qoz) * idz_
                        tmin = jnp.maximum(
                            jnp.maximum(jnp.minimum(t1x, t2x),
                                        jnp.minimum(t1y, t2y)),
                            jnp.minimum(t1z, t2z),
                        )
                        tmax = jnp.minimum(
                            jnp.minimum(jnp.maximum(t1x, t2x),
                                        jnp.maximum(t1y, t2y)),
                            jnp.maximum(t1z, t2z),
                        )
                        chit = (
                            (tmax >= tmin) & (tmax > 0) & (tmin < carry[0])
                        )
                        return lax.cond(
                            jnp.any(chit), do_chunk, lambda cr: cr, carry
                        )

                    carry = lax.fori_loop(0, chunk_count, chunk_body, carry)
                    q_refs[6][sl, :] = carry[0]
                    for r, val in zip(res_refs, carry[1:]):
                        r[sl, :] = val

                return 0

            lax.fori_loop(0, n_groups, group_body, 0)

        return 0

    lax.fori_loop(0, n_supers, super_body, 0)


def _mesh_sweep_stream(tri_hbm, chunk_ref, super_ref,
                       super_start, n_supers, chunk_start, n_chunks,
                       tri_start, tri_count,
                       qox, qoy, qoz, qdx, qdy, qdz, bt0,
                       buf, sem, want_uv=False):
    """HBM-streamed variant of megakernel._mesh_sweep_block for meshes
    whose packed (T/4,96) triangle table exceeds the VMEM budget
    (MAX_MK_TRIS = 80k tris at 128 B/tri after lane padding — the
    round-2 cap this lifts, VERDICT r2 missing #3).

    Walks the table in STREAM_ROWS-row blocks (4096 tris = 512 KB):
    DMA block -> VMEM buf, then the usual chunk loop reads buf at
    block-local offsets. The sweep is compute-bound (~63 VPU ops/tri
    vs 128 B/tri of traffic => ~2% DMA at sequential bandwidth), so
    serial copies suffice — no double buffering. Supernode conds don't
    align with stream blocks and are dropped; per-chunk conds (VMEM
    chunk AABBs) still gate the unrolled tests. VMEM math (the round-2
    crash lesson): buf = 1024 x 128 lanes x 4 B = 512 KB."""
    from .megakernel import (
        MESH_CHUNK,
        MESH_CONDS,
        STREAM_ROWS,
        TRI_ROW,
        _mt_chunk,
    )

    idx_ = 1.0 / qdx
    idy_ = 1.0 / qdy
    idz_ = 1.0 / qdz

    def aabb_range(row, bt):
        mnx, mny, mnz = row[0, 0], row[0, 1], row[0, 2]
        mxx, mxy, mxz = row[0, 3], row[0, 4], row[0, 5]
        t1x = (mnx - qox) * idx_
        t2x = (mxx - qox) * idx_
        t1y = (mny - qoy) * idy_
        t2y = (mxy - qoy) * idy_
        t1z = (mnz - qoz) * idz_
        t2z = (mxz - qoz) * idz_
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        return (tmax >= tmin) & (tmax > 0) & (tmin < bt)

    init = (
        bt0,
        jnp.zeros_like(qox),
        jnp.zeros_like(qox),
        jnp.zeros_like(qox),
    )
    if want_uv:
        init = init + (jnp.zeros_like(qox), jnp.zeros_like(qox))

    rows_per_chunk = MESH_CHUNK // TRI_ROW
    chunks_per_block = STREAM_ROWS // rows_per_chunk
    n_blocks = -(-n_chunks // chunks_per_block)  # static (scene meta)

    def block_body(b, carry):
        cp = pltpu.make_async_copy(
            tri_hbm.at[
                pl.ds(tri_start // TRI_ROW + b * STREAM_ROWS, STREAM_ROWS),
                :,
            ],
            buf,
            sem,
        )
        cp.start()
        cp.wait()
        first = b * chunks_per_block
        count = jnp.minimum(n_chunks - first, chunks_per_block)

        def chunk_body(c, carry):
            cg = first + c

            def do_chunk(carry):
                blk = buf[pl.ds(c * rows_per_chunk, rows_per_chunk), :]
                return _mt_chunk(
                    blk, cg, tri_count,
                    qox, qoy, qoz, qdx, qdy, qdz, carry, want_uv,
                )

            if not MESH_CONDS:
                return do_chunk(carry)
            row = chunk_ref[pl.ds(chunk_start + cg, 1), :]
            chunk_hit = aabb_range(row, carry[0])
            return lax.cond(
                jnp.any(chunk_hit), do_chunk, lambda cr: cr, carry
            )

        return lax.fori_loop(0, count, chunk_body, carry)

    return lax.fori_loop(0, n_blocks, block_body, init)


def _flat_roll(x, s):
    """Circular roll of the row-major (R,128) lane stream by s lanes
    (s a traced non-negative scalar): out[flat q] = x[(q - s) mod R*128].
    Three rolls + one select — the stream-stitching primitive."""
    rows = x.shape[0]
    r = (s // LANE) % rows
    c = s % LANE
    a = pltpu.roll(x, r, axis=0)
    b = pltpu.roll(a, c, axis=1)
    b2 = pltpu.roll(b, 1, axis=0)
    lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < c, b2, b)


def _radix_sort_tile(keyf, arrays, bits):
    """Stable LSB binary-radix sort of a whole (64,128) tile by keyf.

    Each bit pass = TWO runs of the in-tile compaction network (zeros
    packed first, ones appended at offset count0 via _flat_roll) — the
    ROADMAP's 'stable binary-radix partition per bit' built from
    existing primitives. Returns (sorted_arrays, stages) where stages
    records each pass's (mask0, count0) for the exact inverse."""
    rows = keyf.shape[0]
    n = rows * LANE
    flat = (
        lax.broadcasted_iota(jnp.int32, (rows, LANE), 0) * LANE
        + lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    )
    cur = list(arrays)
    cur_key = keyf
    stages = []
    for b in range(bits):
        ki = cur_key.astype(jnp.int32)
        mask0 = ((ki >> b) & 1) == 0
        r0 = make_routing(mask0)
        r1 = make_routing(jnp.logical_not(mask0))
        p0, _, t0 = compact_tile(mask0, cur + [cur_key], routing=r0)
        p1, _, _ = compact_tile(
            jnp.logical_not(mask0), cur + [cur_key], routing=r1
        )
        merged = [
            jnp.where(flat < t0, a0, _flat_roll(a1, t0))
            for a0, a1 in zip(p0, p1)
        ]
        stages.append((mask0, t0))
        cur = merged[:-1]
        cur_key = merged[-1]
    return cur, stages


def _radix_unsort_tile(arrays, stages):
    """Exact inverse of _radix_sort_tile's permutation: undo the bit
    passes in reverse order by splitting the stream at count0 and
    expanding each half back through its recorded mask0 routing."""
    rows = arrays[0].shape[0]
    n = rows * LANE
    flat = (
        lax.broadcasted_iota(jnp.int32, (rows, LANE), 0) * LANE
        + lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    )
    cur = list(arrays)
    for mask0, t0 in reversed(stages):
        mask1 = jnp.logical_not(mask0)
        back = (n - t0) % n
        p0 = [jnp.where(flat < t0, a, 0.0) for a in cur]
        p1 = [
            jnp.where(flat < n - t0, _flat_roll(a, back), 0.0)
            for a in cur
        ]
        r0 = make_routing(mask0)
        r1 = make_routing(mask1)
        e0 = expand_tile(mask0, p0, routing=r0)
        e1 = expand_tile(mask1, p1, routing=r1)
        cur = [a + b for a, b in zip(e0, e1)]
    return cur


def _super_rank_xla(supers, super_start, n_supers, E,
                    qox, qoy, qoz, qdx, qdy, qdz, bt,
                    min_super=None):
    """Per-lane ENTERED-supernode rank slots: keys[j] = index of the
    j-th super whose slab the object-space ray enters before its
    pruning bound bt (j < E), or 2*n_supers (dead sentinel) when the
    lane enters fewer than j+1 supers. Lanes entering MORE than E
    supers overflow to a START-KEYED TAIL: the first E-1 slots stay
    per-super windows and the last slot becomes key
    n_supers + start, start = slots[E-2]+1 (slots record entered
    supers in ASCENDING INDEX order, so every un-recorded entered
    super has index >= start) — the window kernel's single tail
    program sweeps each super s2 against the prefix of the
    start-sorted overflow region with start <= s2, so an overflow
    lane sweeps only [start, n_supers) instead of the whole mesh
    (see _window_sweep; per-start-key tail PROGRAMS were the round-3b
    mistake — block rounding per (start, super) measured 33.9 -> 9.5
    Mrays/s). At E=1 the single slot is the tail with
    start = slots[0]. Exact: supers below start were either swept by
    the window slots or never entered (their triangles satisfy
    t >= te >= bt and the merge's bt0 filter kills them), and slot
    order stays super-ascending so the strict-< merge reproduces the
    dense sweep's tie order. Plain XLA elementwise over the flat
    dense stream — one fori over the supers.

    `min_super` (per-lane int32, optional) restricts the rank to
    supers with index strictly ABOVE it — the SORT_SPILL phase-B
    call passes phase A's first-entered index so the already-swept
    super is never re-entered (slots record ascending indices, so
    every remaining entered super is > first by construction).

    Emitting one stream entry per (lane, entered super) pair is the
    per-lane-exact expansion THE COMPACTION LAW demands (per-lane
    candidacy 2-7%, union over >=128 lanes ~90-100%): every
    union-granular in-kernel cond measured saturated (docs/ANALYSIS.md
    "Big-mesh sweeps"), so the only thing that skips work is routing
    each lane to exactly the supers it entered. Skipping non-entered
    supers is exact: their entry satisfies te >= bt, so any triangle
    inside hits at t >= te >= bt and cannot beat the running best (bt
    only tightens). Rank order ascends with super index — the same
    sweep order as the dense path, so the merged result is
    bit-identical."""
    idx_ = 1.0 / qdx
    idy_ = 1.0 / qdy
    idz_ = 1.0 / qdz
    dead = 2 * n_supers
    slots0 = tuple(
        jnp.full(qox.shape, dead, jnp.int32) for _ in range(E)
    )
    cnt0 = jnp.zeros(qox.shape, jnp.int32)

    def body(s, carry):
        slots, cnt = carry
        row = lax.dynamic_slice_in_dim(supers, super_start + s, 1, 0)[0]
        t1x = (row[0] - qox) * idx_
        t2x = (row[3] - qox) * idx_
        t1y = (row[1] - qoy) * idy_
        t2y = (row[4] - qoy) * idy_
        t1z = (row[2] - qoz) * idz_
        t2z = (row[5] - qoz) * idz_
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        te = jnp.maximum(tmin, 0.0)
        ok = (tmax >= tmin) & (tmax > 0) & (te < bt)
        if min_super is not None:
            ok = ok & (s > min_super)
        slots = tuple(
            jnp.where(ok & (cnt == j), s, sl)
            for j, sl in enumerate(slots)
        )
        return slots, cnt + ok.astype(jnp.int32)

    slots, cnt = lax.fori_loop(0, n_supers, body, (slots0, cnt0))
    over = cnt > E
    if E == 1:
        # the single slot becomes the tail: sweep [slots[0], n_supers)
        return [jnp.where(over, n_supers + slots[0], slots[0])]
    keys = [sl for sl in slots[:E - 1]]
    keys.append(
        jnp.where(over, n_supers + slots[E - 2] + 1, slots[E - 1])
    )
    return keys


def _super_rank_first(supers, super_start, n_supers,
                      qox, qoy, qoz, qdx, qdy, qdz, bt):
    """Index of each lane's FIRST entered supernode (lowest super
    index whose slab the object-space ray enters before bt), or the
    dead sentinel 2*n_supers. Phase A of the SORT_SPILL split sweeps
    exactly this one WINDOW entry per lane — never a tail key, unlike
    _super_rank_xla at E=1 where cnt>1 lanes overflow to a
    [start, n_supers) tail sweep."""
    idx_ = 1.0 / qdx
    idy_ = 1.0 / qdy
    idz_ = 1.0 / qdz
    dead = 2 * n_supers
    first0 = jnp.full(qox.shape, dead, jnp.int32)

    def body(s, first):
        row = lax.dynamic_slice_in_dim(supers, super_start + s, 1, 0)[0]
        t1x = (row[0] - qox) * idx_
        t2x = (row[3] - qox) * idx_
        t1y = (row[1] - qoy) * idy_
        t2y = (row[4] - qoy) * idy_
        t1z = (row[2] - qoz) * idz_
        t2z = (row[5] - qoz) * idz_
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        te = jnp.maximum(tmin, 0.0)
        ok = (tmax >= tmin) & (tmax > 0) & (te < bt)
        return jnp.where(ok & (first == dead), s, first)

    return lax.fori_loop(0, n_supers, body, first0)


def _window_sweep(lo_rows, hi_rows, lo_ent, hi_ent, qstk, bstk, tri,
                  chunks, attrs, meta_i, interpret, want_uv, stream):
    """Per-SUPERNODE window sweep over the key-sorted expanded entry
    stream — the big-mesh traversal kernel.

    grid=(n_supers+1,): program s < sn reads its contiguous window
    [lo_rows[s], hi_rows[s]) — in 8-ROW-BLOCK units — of the sorted
    stream and tests ONLY super s's MESH_SUPER chunks against it; ONE
    tail program (s == sn) sweeps each super s2 against the PREFIX of
    the start-key-sorted overflow region whose entries have
    start <= s2 (see the in-kernel comment; start-keyed keys from
    _super_rank_xla), supers-outer so a streamed table DMAs each slab
    once. lo_ent/hi_ent are the entry-exact (un-rounded) window
    bounds, used only as emptiness guards.
    Zero in-kernel conds: the expansion (_super_rank_xla) already
    routed each lane to exactly its entered supers, so the sweep does
    per-lane-optimal work (measured 1967 row-supers vs 39200 dense on
    mesh_big) — the only design the compaction law admits after four
    measured union-granular negatives (docs/ANALYSIS.md "Big-mesh
    sweeps").

    Boundary rows shared by adjacent programs, dead-sentinel entries
    clamped into the last valid block, and overflow lanes swept for
    supers they never entered are all EXACT: best-t updates are
    strict-< minima over per-(entry, super) disjoint triangle sets
    (idempotent under re-sweep), and a non-entered super's triangles
    satisfy t >= te >= bt. The TPU grid is sequential, so the
    read-modify-write of shared rows through the aliased output needs
    no synchronization beyond the per-block DMA waits.

    qstk: (rows, 6*LANE) lane-concatenated sorted object-space rays
    (read-only); bstk: (rows, NR*LANE) lane-concatenated
    [bt, nx, ny, nz(, u, v)] carry, donated and updated in place
    (input_output_aliases). Lane-concatenation (not a rank-3 stack)
    keeps every DMA a standard full-width (8,128)-tiled slab, and row
    offsets are (block)*8 so Mosaic can prove tile alignment. tri: the
    packed table — VMEM-resident, or HBM-streamed per program when
    stream=True (256-row slab = 128 KB VMEM buffer; the table is
    padded by STREAM_ROWS rows at pack time so slab DMAs stay in
    bounds)."""
    from .megakernel import MESH_CHUNK, MESH_SUPER, TRI_ROW, _mt_chunk

    (ss, sn, cs, cn, ts, tc, aabb) = meta_i
    rpc = MESH_CHUNK // TRI_ROW
    sup_rows = MESH_SUPER * rpc
    dense_rows = qstk.shape[0]
    # The piped path DMAs rows [(lo_w+b)*8, +8) with no clamp; the
    # hi bound guarantees hi_r <= rows//8 ONLY when rows is a multiple
    # of 8 (today: r8()/TILE_ROWS=64/cap_c_rows enforce it). Defend
    # the invariant here so a future non-8-multiple caller fails loud
    # instead of issuing an out-of-bounds HBM DMA.
    assert dense_rows % 8 == 0, (
        f"_window_sweep stream rows must be 8-aligned, got {dense_rows}"
    )
    NR = bstk.shape[1] // LANE
    cull = SWEEP_CULL
    pipe = SWEEP_PIPE
    # deferred attribute fetch rides the legacy block loop only
    # (SWEEP_PIPE measured a wash; composing them buys nothing)
    defer = SWEEP_DEFER and not pipe
    packwin = SWEEP_PACKWIN and defer

    # b_in is the donated operand backing b_out (input_output_aliases);
    # all reads and writes go through b_out so every program sees its
    # predecessors' updates.
    def kern(lo_ref, hi_ref, loe_ref, hie_ref, tri_ref, *kargs):
        if cull:
            ch_ref, *kargs = kargs
        else:
            ch_ref = None
        if defer:
            q_any, b_in, attr_any, b_out, qbuf, bbuf, *rest = kargs
            *rest, abuf, asem = rest
        else:
            q_any, b_in, b_out, qbuf, bbuf, *rest = kargs
        del b_in
        if pipe:
            *rest, lsem, wsem = rest
        if stream:
            tbuf, sem = rest
        else:
            (sem,) = rest
        s = pl.program_id(0)
        lo_b = lo_ref[s]
        hi_b = hi_ref[s]

        def sweep_super(s2, qox, qoy, qoz, qdx, qdy, qdz, carry):
            chunk_count = jnp.minimum(cn - s2 * MESH_SUPER, MESH_SUPER)
            if cull:
                idx_ = 1.0 / qdx
                idy_ = 1.0 / qdy
                idz_ = 1.0 / qdz

            def chunk_body(c, carry):
                cg = s2 * MESH_SUPER + c

                def do_chunk(carry):
                    if stream:
                        blkrows = tbuf[pl.ds(c * rpc, rpc), :]
                    else:
                        blkrows = tri_ref[
                            pl.ds(
                                ts // TRI_ROW + s2 * sup_rows + c * rpc,
                                rpc,
                            ),
                            :,
                        ]
                    return _mt_chunk(
                        blkrows, cg, tc,
                        qox, qoy, qoz, qdx, qdy, qdz, carry, want_uv,
                        defer_row=(c * rpc) if defer else None,
                        packwin=packwin,
                    )

                if not cull:
                    return do_chunk(carry)
                # Chunk-grain slab test vs each lane's RUNNING best t
                # (carry[0]); skip the 32 MT tests when NO lane can
                # win: a contained tri's t >= the slab's tmin, so
                # tmin >= bt now implies t >= any later (smaller) bt,
                # and strict-< updates ignore it — the exact argument
                # the expansion's super-level bound already rests on.
                # Junk lanes (dead-sentinel padding) can only
                # spuriously KEEP a chunk, never skip a winnable one.
                row = ch_ref[pl.ds(cs + cg, 1), :]
                t1x = (row[0, 0] - qox) * idx_
                t2x = (row[0, 3] - qox) * idx_
                t1y = (row[0, 1] - qoy) * idy_
                t2y = (row[0, 4] - qoy) * idy_
                t1z = (row[0, 2] - qoz) * idz_
                t2z = (row[0, 5] - qoz) * idz_
                tmin = jnp.maximum(
                    jnp.maximum(
                        jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)
                    ),
                    jnp.minimum(t1z, t2z),
                )
                tmax = jnp.minimum(
                    jnp.minimum(
                        jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)
                    ),
                    jnp.maximum(t1z, t2z),
                )
                ok = (tmax >= tmin) & (tmax > 0) & (tmin < carry[0])
                return lax.cond(
                    jnp.any(ok), do_chunk, lambda cr: cr, carry
                )

            return lax.fori_loop(0, chunk_count, chunk_body, carry)

        def blocks_for_super_win(s2, lo_w, hi_w):
            # one streamed slab DMA per (program, swept super)
            if stream:
                cp = pltpu.make_async_copy(
                    tri_ref.at[
                        pl.ds(ts // TRI_ROW + s2 * sup_rows, sup_rows),
                        :,
                    ],
                    tbuf,
                    sem,
                )
                cp.start()
                cp.wait()
            if defer:
                # the swept super's (192, sup_rows) bf16 attribute
                # slab — one DMA per (program, swept super), same
                # cadence as the streamed tri slab
                acp = pltpu.make_async_copy(
                    attr_any.at[ss + s2], abuf, asem
                )
                acp.start()
                acp.wait()

            if not pipe:
                def blk_body(b, _):
                    rb = jnp.minimum(lo_w + b, dense_rows // 8 - 1)
                    r = rb * 8
                    cp1 = pltpu.make_async_copy(
                        q_any.at[pl.ds(r, 8)], qbuf, sem
                    )
                    cp1.start()
                    cp1.wait()
                    cp2 = pltpu.make_async_copy(
                        b_out.at[pl.ds(r, 8)], bbuf, sem
                    )
                    cp2.start()
                    cp2.wait()
                    qsl = lambda j: qbuf[:, j * LANE:(j + 1) * LANE]
                    carry = tuple(
                        bbuf[:, j * LANE:(j + 1) * LANE]
                        for j in range(NR)
                    )
                    if defer:
                        from .megakernel import _attr_fetch

                        neg1 = jnp.full((8, LANE), -1.0, jnp.float32)
                        zz = jnp.zeros((8, LANE), jnp.float32)
                        if packwin:
                            dcar = sweep_super(
                                s2, qsl(0), qsl(1), qsl(2), qsl(3),
                                qsl(4), qsl(5),
                                (carry[0], neg1, zz, zz),
                            )
                            bt_n, brp, bu, bv = dcar
                            # exact unpack: rp in {-1} u [0, 1023]
                            # ints; *0.25 and floor are exact in
                            # binary, and rp=-1 (no winner) maps to
                            # brow=-1 exactly as the unpacked carry.
                            brow = jnp.floor(brp * 0.25)
                            bpos = brp - 4.0 * brow
                        else:
                            dcar = sweep_super(
                                s2, qsl(0), qsl(1), qsl(2), qsl(3),
                                qsl(4), qsl(5),
                                (carry[0], neg1, zz, zz, zz),
                            )
                            bt_n, brow, bpos, bu, bv = dcar
                        fat = _attr_fetch(abuf[:], brow, bpos, want_uv)
                        # SAME f32 expression _mt_chunk folds inline
                        # (fetched attrs are the exact table f32s, u/v
                        # are exact copies). Mosaic lowers both
                        # contexts literally (mul, mul, mul, add, add)
                        # so hardware output is bit-identical;
                        # interpret mode (XLA:CPU) FMA-contracts the
                        # two graph contexts differently — a known
                        # 1-ulp normal diff on ~0.1% of lanes, see
                        # tests/test_radix.py's defer rows.
                        w = 1.0 - bu - bv

                        def interp(a, b, c2):
                            return w * a + bu * b + bv * c2

                        nx = interp(fat[0], fat[3], fat[6])
                        ny = interp(fat[1], fat[4], fat[7])
                        nz = interp(fat[2], fat[5], fat[8])
                        sel = brow >= 0.0
                        outs = [
                            bt_n,
                            jnp.where(sel, nx, carry[1]),
                            jnp.where(sel, ny, carry[2]),
                            jnp.where(sel, nz, carry[3]),
                        ]
                        if want_uv:
                            tu = interp(fat[9], fat[11], fat[13])
                            tw = interp(fat[10], fat[12], fat[14])
                            outs += [
                                jnp.where(sel, tu, carry[4]),
                                jnp.where(sel, tw, carry[5]),
                            ]
                        carry = tuple(outs)
                    else:
                        carry = sweep_super(
                            s2, qsl(0), qsl(1), qsl(2), qsl(3),
                            qsl(4), qsl(5), carry,
                        )
                    for j in range(NR):
                        bbuf[:, j * LANE:(j + 1) * LANE] = carry[j]
                    cp3 = pltpu.make_async_copy(
                        bbuf, b_out.at[pl.ds(r, 8)], sem
                    )
                    cp3.start()
                    cp3.wait()
                    return 0

                lax.fori_loop(0, hi_w - lo_w, blk_body, 0)
                return 0

            # SWEEP_PIPE: 3-slot rotated software pipeline. Slot
            # k = b % 3 holds block b's 8 rows at VMEM rows
            # [8k, 8k+8) of qbuf/bbuf (8-row-aligned dynamic slices —
            # the only dynamic-offset form Mosaic lowers, CLAUDE.md).
            # Steady state: block b+1's two loads and block b-1's
            # writeback are in flight during block b's MT sweep; the
            # only waits that can stall are on DMAs issued a full
            # compute-phase earlier. Row ranges of in-flight blocks
            # never alias (rows strictly increase with b within a
            # window; see SWEEP_PIPE comment at the flag), and the
            # epilogue drains all writebacks so later windows and
            # programs read completed rows.
            nb = hi_w - lo_w

            def load(b, slot):
                r = (lo_w + b) * 8
                return (
                    pltpu.make_async_copy(
                        q_any.at[pl.ds(r, 8)],
                        qbuf.at[pl.ds(slot * 8, 8)],
                        lsem.at[slot, 0],
                    ),
                    pltpu.make_async_copy(
                        b_out.at[pl.ds(r, 8)],
                        bbuf.at[pl.ds(slot * 8, 8)],
                        lsem.at[slot, 1],
                    ),
                )

            def wback(b, slot):
                r = (lo_w + b) * 8
                return pltpu.make_async_copy(
                    bbuf.at[pl.ds(slot * 8, 8)],
                    b_out.at[pl.ds(r, 8)],
                    wsem.at[slot],
                )

            # prologue: block 0's loads (nb >= 1 — callers guard on
            # entry-exact emptiness, but keep the when for safety:
            # an unwaited start would leak a semaphore count)
            @pl.when(nb > 0)
            def _():
                for cp in load(0, 0):
                    cp.start()

            def blk_body(b, _):
                slot = lax.rem(b, 3)
                nslot = lax.rem(b + 1, 3)

                # prefetch block b+1 into its slot; first drain the
                # writeback of block b-2 (the slot's previous tenant,
                # started two iterations ago — one full compute phase
                # of overlap)
                @pl.when(b + 1 < nb)
                def _():
                    @pl.when(b + 1 >= 3)
                    def _():
                        wback(b - 2, nslot).wait()

                    for cp in load(b + 1, nslot):
                        cp.start()

                for cp in load(b, slot):
                    cp.wait()
                ro = slot * 8
                qsl = lambda j: qbuf[
                    pl.ds(ro, 8), j * LANE:(j + 1) * LANE
                ]
                carry = tuple(
                    bbuf[pl.ds(ro, 8), j * LANE:(j + 1) * LANE]
                    for j in range(NR)
                )
                carry = sweep_super(
                    s2, qsl(0), qsl(1), qsl(2), qsl(3), qsl(4), qsl(5),
                    carry,
                )
                for j in range(NR):
                    bbuf[pl.ds(ro, 8), j * LANE:(j + 1) * LANE] = (
                        carry[j]
                    )
                wback(b, slot).start()
                return 0

            lax.fori_loop(0, nb, blk_body, 0)

            # epilogue: drain the last min(3, nb) writebacks (earlier
            # ones were drained by the prefetch waits)
            for k in range(3):
                @pl.when(nb - 1 - k >= jnp.maximum(0, nb - 3))
                def _(k=k):
                    b = nb - 1 - k
                    wback(b, lax.rem(b, 3)).wait()

            return 0

        def blocks_for_super(s2, _):
            blocks_for_super_win(s2, lo_b, hi_b)
            return 0

        # emptiness guards are ENTRY-exact (loe/hie): the block-rounded
        # lo/hi of an empty window straddling a block boundary would
        # otherwise sweep that boundary block for nothing
        @pl.when((hie_ref[s] > loe_ref[s]) & (s < sn))
        def _():
            blocks_for_super(s, 0)

        # ONE tail program (s == sn) handles every start-keyed overflow
        # entry with PREFIX windows: tail entries sort by their start
        # key (sn + start), so the entries that must sweep super s2 —
        # those with start <= s2 — are exactly the prefix
        # [lo_ref[sn], hi_ref[sn + s2]) of the tail region (lo_ref[sn]
        # = first entry with key >= sn; hi_ref[sn+s2] = block-rounded
        # end of keys <= sn+s2; dead sentinels at 2*sn stay outside
        # every prefix). This keeps the start-keyed design's halved
        # per-lane tail work but pays block rounding ONCE per super
        # instead of once per (start key, super): the round-3b
        # per-start-key tail programs (grid 2*sn) each rounded their
        # 1-2-entry windows up to a full 8-row block and swept it
        # against [start, sn) supers — measured 33.9 -> 9.5 Mrays/s on
        # mesh_big (tools/breakdown_bigmesh.py round 4: the window
        # sweep was 84% of the frame). Supers-outer so a streamed slab
        # still DMAs once per swept super.
        @pl.when(s >= sn)
        def _():
            lo_t = lo_ref[sn]
            lo_e = loe_ref[sn]

            def tail_super(s2, _):
                @pl.when(hie_ref[sn + s2] > lo_e)
                def _():
                    blocks_for_super_win(s2, lo_t, hi_ref[sn + s2])

                return 0

            lax.fori_loop(0, sn, tail_super, 0)

    smem1 = lambda shp: pl.BlockSpec(
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.SMEM
    )
    anyspace = pl.BlockSpec(memory_space=pltpu.ANY)
    vfull = lambda shp: pl.BlockSpec(
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    # Grid: sn per-super window programs + ONE prefix-window tail
    # program. lo/hi stay (2*sn,) — the tail program indexes
    # hi_ref[sn + s2] for its per-super prefixes.
    return pl.pallas_call(
        kern,
        grid=(sn + 1,),
        in_specs=[
            smem1((2 * sn,)), smem1((2 * sn,)),
            smem1((2 * sn,)), smem1((2 * sn,)),
            (anyspace if stream else vfull(tuple(tri.shape))),
        ]
        + ([vfull(tuple(chunks.shape))] if cull else [])
        + [anyspace, anyspace]
        + ([anyspace] if defer else []),
        out_specs=anyspace,
        out_shape=jax.ShapeDtypeStruct(bstk.shape, jnp.float32),
        input_output_aliases={(7 if cull else 6): 0},
        # VMEM: qbuf/bbuf (3 slots when piped: 72+48 KB; else 24+16 KB)
        # + the streamed 256-row slab (128 KB) + (cull) the chunk-AABB
        # table + (defer) the (192, sup_rows) bf16 attr slab (98 KB) —
        # far under budget.
        scratch_shapes=[
            pltpu.VMEM(((24 if pipe else 8), 6 * LANE), jnp.float32),
            pltpu.VMEM(((24 if pipe else 8), NR * LANE), jnp.float32),
        ]
        + (
            [pltpu.VMEM((sup_rows, tri.shape[1]), jnp.float32)]
            if stream else []
        )
        + [pltpu.SemaphoreType.DMA]
        + (
            [pltpu.SemaphoreType.DMA((3, 2)),
             pltpu.SemaphoreType.DMA((3,))]
            if pipe else []
        )
        + (
            [pltpu.VMEM((attrs.shape[1], attrs.shape[2]),
                        jnp.bfloat16),
             pltpu.SemaphoreType.DMA]
            if defer else []
        ),
        interpret=interpret,
    )(lo_rows, hi_rows, lo_ent, hi_ent, tri,
      *((chunks,) if cull else ()), qstk, bstk,
      *((attrs,) if defer else ()))


def _kc_compact(keyf, qep, dead, interpret):
    """Per-tile pack of REAL expanded entries — K1's compact_tile idiom
    applied to the (rows_ep, LANE) expanded sort stream.

    An expanded entry is real iff its key is below the dead sentinel
    (2*n_supers); mean real occupancy on mesh_big is 2.5 of E=6 slots,
    so dropping dead entries before the two global sorts moves ~2.4x
    fewer elements through lax.sort — the element-count lever the
    sort-operand packing experiment proved is the only one that pays at
    bandwidth-bound sizes (docs/ANALYSIS.md "Sort-operand packing").

    Returns (packed8, counts): packed8 = [key, idx, qox..qdz] with each
    tile's real entries packed to its own row-major prefix (the global
    stitch is _ks_stitch), counts = per-tile real-entry totals. idx is
    the entry-major flat position, generated in-kernel and carried as
    f32 — exact because callers gate on 2*N_e <= 2**24."""
    rows_ep = keyf.shape[0] // LANE
    n_t = rows_ep // TILE_ROWS
    smem, vfull, tile, anyspace = _specs_helpers(n_t)
    r2 = lambda a: a.reshape(rows_ep, LANE)
    shape2d = jax.ShapeDtypeStruct((rows_ep, LANE), jnp.float32)

    def kc(key_ref, q0, q1, q2, q3, q4, q5, *outs):
        counts_o = outs[-1]
        pk_refs = outs[:-1]
        k = pl.program_id(0)
        kf = key_ref[:]
        mask = kf < jnp.float32(dead)
        routing = make_routing(mask)
        fp = (
            lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 0) * LANE
            + lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 1)
        )
        idxf = (fp + k * TILE_LANES).astype(jnp.float32)
        packed, _pm, total = compact_tile(
            mask, [kf, idxf, q0[:], q1[:], q2[:], q3[:], q4[:], q5[:]],
            routing=routing,
        )
        for ref, val in zip(pk_refs, packed):
            ref[:] = val
        counts_o[k] = total

    outs = pl.pallas_call(
        kc,
        grid=(n_t,),
        in_specs=[tile] * 7,
        out_specs=[tile] * 8 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[shape2d] * 8
        + [jax.ShapeDtypeStruct((n_t,), jnp.int32)],
        interpret=interpret,
    )(r2(keyf), *(r2(a) for a in qep))
    return outs[:8], outs[8]


def _ks_stitch(packed8, goffe, counts_e, csum_e, cap_c_rows,
               dead, N_e, interpret):
    """Stitch _kc_compact's per-tile packed prefixes into ONE dense
    compacted stream of cap_c_rows rows — K2's src_body idiom (DMA each
    overlapping packed region + _flat_roll + masked blend), with the
    per-dense-tile source RANGE precomputed in XLA (searchsorted over
    the monotone offsets) so the in-kernel loop touches only the ~3
    overlapping sources instead of scanning all n_tiles.

    Every output tile is fully initialized first (the sorts consume the
    whole cap_cn prefix): tail slots get key = dead and
    idx = N_e + flat_position — GREATER than every real entry-major idx
    (< N_e), so the unsort (sort2 by idx) puts them strictly after all
    real results; both stay f32-exact under the 2*N_e <= 2**24 gate."""
    n_src = packed8[0].shape[0] // TILE_ROWS
    nd_t = cap_c_rows // TILE_ROWS
    base_d = jnp.arange(nd_t, dtype=jnp.int32) * TILE_LANES
    klo = jnp.searchsorted(csum_e, base_d, side="right").astype(jnp.int32)
    khi = jnp.searchsorted(goffe, base_d + TILE_LANES, side="left").astype(
        jnp.int32
    )
    smem, vfull, tile, anyspace = _specs_helpers(nd_t)
    shape2d = jax.ShapeDtypeStruct((cap_c_rows, LANE), jnp.float32)

    def ks(klo_ref, khi_ref, goff_ref, cnt_ref, *rest):
        pk_refs = rest[:8]
        outs = rest[8:16]
        scrs = rest[16:24]
        sem = rest[24]
        d = pl.program_id(0)
        fp = (
            lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 0) * LANE
            + lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 1)
        )
        base = d * TILE_LANES
        # init: dead key, past-all-real idx, unit-z ray
        outs[0][:] = jnp.full((TILE_ROWS, LANE), float(dead), jnp.float32)
        outs[1][:] = (fp + (base + N_e)).astype(jnp.float32)
        zero = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
        for j in range(2, 8):
            outs[j][:] = zero + 1.0 if j == 7 else zero

        def src_body(k, _):
            gk = goff_ref[k]
            ck = cnt_ref[k]
            overlap = jnp.logical_and(
                jnp.logical_and(gk < base + TILE_LANES, ck > 0),
                gk + ck > base,
            )

            @pl.when(overlap)
            def _():
                s = gk - base
                sm = s % TILE_LANES
                m = (fp >= s) & (fp < s + ck)
                # all 8 copies in flight at once (per-slot semaphores,
                # the guide's multi-DMA idiom) — the stitch is
                # latency-bound, not bandwidth-bound
                cps = [
                    pltpu.make_async_copy(
                        pk.at[pl.ds(k * TILE_ROWS, TILE_ROWS), :],
                        scr,
                        sem.at[j],
                    )
                    for j, (pk, scr) in enumerate(zip(pk_refs, scrs))
                ]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                for j in range(8):
                    outs[j][:] = jnp.where(
                        m, _flat_roll(scrs[j][:], sm), outs[j][:]
                    )
            return 0

        lax.fori_loop(klo_ref[d], khi_ref[d], src_body, 0)

    return pl.pallas_call(
        ks,
        grid=(nd_t,),
        in_specs=[
            smem((nd_t,)), smem((nd_t,)),
            smem((n_src,)), smem((n_src,)),
        ] + [anyspace] * 8,
        out_specs=[tile] * 8,
        out_shape=[shape2d] * 8,
        scratch_shapes=[pltpu.VMEM((TILE_ROWS, LANE), jnp.float32)] * 8
        + [pltpu.SemaphoreType.DMA((8,))],
        interpret=interpret,
    )(klo, khi, goffe, counts_e, *packed8)


def _kx_expand(keyf, goffe, counts_e, back_c, dead, interpret):
    """Inverse of _kc_compact/_ks_stitch for the RESULT arrays: route
    each source tile's window of the unsorted compacted results back to
    its entry-major expanded positions — K3's _routeback_and_merge
    idiom (window DMA at the tile's global offset + _flat_roll +
    expand_tile over the recomputed mask/routing, bit-identical to the
    forward pack's).

    back_c: list of (cap_c_rows + WIN_ROWS, LANE) result arrays in
    compacted order (bt first), row-padded so the fixed WIN_ROWS window
    DMA stays in bounds. Dead entries of the bt output get FLT_MAX (the
    strict-< merge and the bt < FLT_MAX hit test both ignore them);
    other outputs get zeros."""
    rows_ep = keyf.shape[0] // LANE
    n_t = rows_ep // TILE_ROWS
    nr = len(back_c)
    smem, vfull, tile, anyspace = _specs_helpers(n_t)
    shape2d = jax.ShapeDtypeStruct((rows_ep, LANE), jnp.float32)

    def kx(goff_ref, cnt_ref, key_ref, *rest):
        dense_ins = rest[:nr]
        outs = rest[nr:2 * nr]
        wins = rest[2 * nr:3 * nr]
        sem = rest[3 * nr]
        k = pl.program_id(0)
        outs[0][:] = jnp.full((TILE_ROWS, LANE), FLT_MAX, jnp.float32)
        zero = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
        for j in range(1, nr):
            outs[j][:] = zero
        ck = cnt_ref[k]

        @pl.when(ck > 0)
        def _():
            kf = key_ref[:]
            mask = kf < jnp.float32(dead)
            routing = make_routing(mask)
            w0 = goff_ref[k]
            r0 = w0 // LANE
            c0 = w0 - r0 * LANE
            cps = [
                pltpu.make_async_copy(
                    src.at[pl.ds(r0, WIN_ROWS), :], wref, sem.at[j]
                )
                for j, (src, wref) in enumerate(zip(dense_ins, wins))
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            back = (WIN_ROWS * LANE - c0) % (WIN_ROWS * LANE)
            fp = (
                lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 0)
                * LANE
                + lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 1)
            )
            # zero past ck: the window may cover rows the stitch never
            # wrote (uninitialized VMEM is NaN on hardware and would
            # poison the routing matmul — the round-3 lesson)
            locs = [
                jnp.where(
                    fp < ck,
                    _flat_roll(wref[:], back)[0:TILE_ROWS, :],
                    0.0,
                )
                for wref in wins
            ]
            expanded = expand_tile(mask, locs, routing=routing)
            outs[0][:] = jnp.where(mask, expanded[0], FLT_MAX)
            for j in range(1, nr):
                outs[j][:] = expanded[j]

    return pl.pallas_call(
        kx,
        grid=(n_t,),
        in_specs=[smem((n_t,)), smem((n_t,)), tile] + [anyspace] * nr,
        out_specs=[tile] * nr,
        out_shape=[shape2d] * nr,
        scratch_shapes=[pltpu.VMEM((WIN_ROWS, LANE), jnp.float32)] * nr
        + [pltpu.SemaphoreType.DMA((nr,))],
        interpret=interpret,
    )(goffe, counts_e, keyf.reshape(rows_ep, LANE), *back_c)


def _kr_partition(keyf, arrays, bit, interpret):
    """One tile-local half of a stable binary-radix pass: pack each
    tile's bit-0 entries to a packed0 prefix and its bit-1 entries to
    a packed1 prefix (two routings over the same tile — compaction is
    order-preserving, so zeros-then-ones with cross-tile offsets is a
    STABLE partition). Returns (packed0, packed1, counts0)."""
    del keyf  # arrays[0] IS the key; kept in the signature for clarity
    rows = arrays[0].shape[0]
    n_t = rows // TILE_ROWS
    n_a = len(arrays)
    smem, vfull, tile, anyspace = _specs_helpers(n_t)
    shape2d = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)

    def kr(*rest):
        ins = rest[:n_a]
        outs0 = rest[n_a:2 * n_a]
        outs1 = rest[2 * n_a:3 * n_a]
        counts_o = rest[3 * n_a]
        k = pl.program_id(0)
        ki = ins[0][:].astype(jnp.int32)
        mask0 = (ki & (1 << bit)) == 0  # AND, not vector shift
        mask1 = jnp.logical_not(mask0)
        r0 = make_routing(mask0)
        r1 = make_routing(mask1)
        vals = [r[:] for r in ins]
        p0, _m0, t0 = compact_tile(mask0, vals, routing=r0)
        p1, _m1, _t1 = compact_tile(mask1, vals, routing=r1)
        for ref, val in zip(outs0, p0):
            ref[:] = val
        for ref, val in zip(outs1, p1):
            ref[:] = val
        counts_o[k] = t0

    outs = pl.pallas_call(
        kr,
        grid=(n_t,),
        in_specs=[tile] * n_a,
        out_specs=[tile] * (2 * n_a)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[shape2d] * (2 * n_a)
        + [jax.ShapeDtypeStruct((n_t,), jnp.int32)],
        interpret=interpret,
    )(*arrays)
    return outs[:n_a], outs[n_a:2 * n_a], outs[2 * n_a]


def _kr_stitch2(p0, p1, goff0, c0, ends0, goff1, c1, ends1, interpret):
    """Stitch a radix pass's two packed region sets into one dense
    stream: tile k's zeros at [goff0[k], +c0[k]), its ones at
    [goff1[k], +c1[k]) — both monotone, and together they tile the
    whole stream (every entry lands on exactly one side), so no init
    pass is needed. Same DMA + _flat_roll + masked-blend idiom as
    _ks_stitch, with XLA-precomputed source ranges for both sets."""
    n_a = len(p0)
    rows = p0[0].shape[0]
    n_t = rows // TILE_ROWS
    base_d = jnp.arange(n_t, dtype=jnp.int32) * TILE_LANES
    rng = lambda g, e: (
        jnp.searchsorted(e, base_d, side="right").astype(jnp.int32),
        jnp.searchsorted(g, base_d + TILE_LANES, side="left").astype(
            jnp.int32
        ),
    )
    klo0, khi0 = rng(goff0, ends0)
    klo1, khi1 = rng(goff1, ends1)
    smem, vfull, tile, anyspace = _specs_helpers(n_t)
    shape2d = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)

    def ks2(klo0_r, khi0_r, klo1_r, khi1_r,
            g0_r, c0_r, g1_r, c1_r, *rest):
        pk0 = rest[:n_a]
        pk1 = rest[n_a:2 * n_a]
        outs = rest[2 * n_a:3 * n_a]
        scrs = rest[3 * n_a:4 * n_a]
        sem = rest[4 * n_a]
        d = pl.program_id(0)
        fp = (
            lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 0) * LANE
            + lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 1)
        )
        base = d * TILE_LANES
        # every position belongs to exactly one (set, source) region,
        # but init anyway: uninitialized VMEM is NaN on hardware and
        # outputs must be deterministic (the K2 convention)
        zero = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
        for j in range(n_a):
            outs[j][:] = zero

        def mk_body(pk_refs, g_ref, cc_ref):
            def src_body(k, _):
                gk = g_ref[k]
                ck = cc_ref[k]
                overlap = jnp.logical_and(
                    jnp.logical_and(gk < base + TILE_LANES, ck > 0),
                    gk + ck > base,
                )

                @pl.when(overlap)
                def _():
                    s = gk - base
                    sm = s % TILE_LANES
                    m = (fp >= s) & (fp < s + ck)
                    cps = [
                        pltpu.make_async_copy(
                            pk.at[pl.ds(k * TILE_ROWS, TILE_ROWS), :],
                            scr,
                            sem.at[j],
                        )
                        for j, (pk, scr) in enumerate(zip(pk_refs,
                                                          scrs))
                    ]
                    for cp in cps:
                        cp.start()
                    for cp in cps:
                        cp.wait()
                    for j in range(n_a):
                        outs[j][:] = jnp.where(
                            m, _flat_roll(scrs[j][:], sm), outs[j][:]
                        )

                return 0

            return src_body

        lax.fori_loop(
            klo0_r[d], khi0_r[d], mk_body(pk0, g0_r, c0_r), 0
        )
        lax.fori_loop(
            klo1_r[d], khi1_r[d], mk_body(pk1, g1_r, c1_r), 0
        )

    return pl.pallas_call(
        ks2,
        grid=(n_t,),
        in_specs=[smem((n_t,))] * 8
        + [anyspace] * (2 * n_a),
        out_specs=[tile] * n_a,
        out_shape=[shape2d] * n_a,
        scratch_shapes=[pltpu.VMEM((TILE_ROWS, LANE), jnp.float32)]
        * n_a
        + [pltpu.SemaphoreType.DMA((n_a,))],
        interpret=interpret,
    )(klo0, khi0, klo1, khi1, goff0, c0, goff1, c1, *p0, *p1)


def _kr_unpartition(keyf_stage, bit, goff0, c0, goff1, c1,
                    back_padded, interpret):
    """Exact inverse of one radix pass for the RESULT arrays: per
    source tile, re-derive the pass's two masks/routings from the
    recorded stage key (the K3 mask-recompute trick), window-DMA the
    tile's zero and one regions from the partitioned stream, expand
    both halves back, and select by mask. No sort: the permutation is
    inverted structurally."""
    rows = keyf_stage.shape[0]
    n_t = rows // TILE_ROWS
    n_a = len(back_padded)
    smem, vfull, tile, anyspace = _specs_helpers(n_t)
    shape2d = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)

    def ku(g0_r, c0_r, g1_r, c1_r, key_ref, *rest):
        dense_ins = rest[:n_a]
        outs = rest[n_a:2 * n_a]
        wins = rest[2 * n_a:4 * n_a]
        sem = rest[4 * n_a]
        k = pl.program_id(0)
        ki = key_ref[:].astype(jnp.int32)
        mask0 = (ki & (1 << bit)) == 0  # AND, not vector shift
        mask1 = jnp.logical_not(mask0)
        r0 = make_routing(mask0)
        r1 = make_routing(mask1)
        fp = (
            lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 0) * LANE
            + lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 1)
        )

        def windows(g_ref, cc_ref, woff):
            w0 = g_ref[k]
            r0_ = w0 // LANE
            c0_ = w0 - r0_ * LANE
            cps = [
                pltpu.make_async_copy(
                    src.at[pl.ds(r0_, WIN_ROWS), :],
                    wins[woff + j],
                    sem.at[woff + j],
                )
                for j, src in enumerate(dense_ins)
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            back = (WIN_ROWS * LANE - c0_) % (WIN_ROWS * LANE)
            ck = cc_ref[k]
            return [
                jnp.where(
                    fp < ck,
                    _flat_roll(wins[woff + j][:], back)
                    [0:TILE_ROWS, :],
                    0.0,
                )
                for j in range(n_a)
            ]

        loc0 = windows(g0_r, c0_r, 0)
        loc1 = windows(g1_r, c1_r, n_a)
        e0 = expand_tile(mask0, loc0, routing=r0)
        e1 = expand_tile(mask1, loc1, routing=r1)
        for j in range(n_a):
            outs[j][:] = jnp.where(mask0, e0[j], e1[j])

    return pl.pallas_call(
        ku,
        grid=(n_t,),
        in_specs=[smem((n_t,))] * 4 + [tile] + [anyspace] * n_a,
        out_specs=[tile] * n_a,
        out_shape=[shape2d] * n_a,
        scratch_shapes=[pltpu.VMEM((WIN_ROWS, LANE), jnp.float32)]
        * (2 * n_a)
        + [pltpu.SemaphoreType.DMA((2 * n_a,))],
        interpret=interpret,
    )(goff0, c0, goff1, c1, keyf_stage, *back_padded)


def _radix_sort_stream(arrays, bits, interpret):
    """Stable LSB binary-radix sort of the compacted stream by
    arrays[0] (the f32 key). Returns (sorted_arrays, stages); stages
    feed _radix_unsort_stream. Stable on an ascending-idx input ==
    the packed (key, idx) sort — bit-identical downstream order —
    without carrying idx at all."""
    n_t = arrays[0].shape[0] // TILE_ROWS
    base = jnp.arange(n_t, dtype=jnp.int32) * TILE_LANES
    cur = list(arrays)
    stages = []
    for b in range(bits):
        p0, p1, c0 = _kr_partition(cur[0], cur, b, interpret)
        csum0 = jnp.cumsum(c0)
        goff0 = csum0 - c0
        t0 = csum0[n_t - 1]
        goff1 = t0 + base - goff0
        c1 = jnp.full((n_t,), TILE_LANES, jnp.int32) - c0
        ends1 = goff1 + c1
        stages.append((cur[0], b, goff0, c0, goff1, c1))
        cur = list(_kr_stitch2(
            p0, p1, goff0, c0, csum0, goff1, c1, ends1, interpret
        ))
    return cur, stages


def _radix_unsort_stream(back2d, stages, interpret):
    """Invert the full radix permutation on the result arrays: undo
    the bit passes in reverse order. back2d: list of (rows, LANE)."""
    cur = list(back2d)
    padw = jnp.zeros((WIN_ROWS, LANE), jnp.float32)
    for (keyf_stage, b, goff0, c0, goff1, c1) in reversed(stages):
        padded = [jnp.concatenate([a, padw]) for a in cur]
        cur = list(_kr_unpartition(
            keyf_stage, b, goff0, c0, goff1, c1, padded, interpret
        ))
    return cur


def _pack2_u64(a, b):
    """Two f32 payloads -> ONE u64 sort operand (a in the high bits).
    Pure bitcasts — exact roundtrip (tools/bench_sort.py checks
    max|d|=0). The word is only ever MOVED by the sort (or compared
    strictly below unique high key bits), never interpreted. Callers
    must be inside jax.enable_x64(True) or the u64s silently demote."""
    ua = lax.bitcast_convert_type(a, jnp.uint32).astype(jnp.uint64)
    ub = lax.bitcast_convert_type(b, jnp.uint32).astype(jnp.uint64)
    return (ua << jnp.uint64(32)) | ub


def _unpack2_u64(p):
    hi = (p >> jnp.uint64(32)).astype(jnp.uint32)
    lo = (p & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    return (
        lax.bitcast_convert_type(hi, jnp.float32),
        lax.bitcast_convert_type(lo, jnp.float32),
    )


def _sorted_mesh_merge(scene, mesh_meta, sorted_ids,
                       xf, inv, invt, gmat, tri, chunks, supers,
                       d_outs, res_outs, total,
                       want_uv, interpret, stream):
    """The sorted-stream big-mesh traversal: for each geom in
    sorted_ids, EXPAND the dense candidate stream to one entry per
    (lane, entered supernode) pair (_super_rank_xla — per-lane mean
    ~2.5 of ~50 supers on mesh_big), ONE global multisort of the
    expanded stream by entry key, ONE _window_sweep kernel pass (each
    program sweeps only its own super — per-lane-exact work), ONE
    unsort by the carried entry index, a (E, capn) min-merge back to
    lanes, then the world-space epilogue and the merge with K2's
    (small-geom) results — all at the XLA kernel boundary, where
    lax.sort moves payloads through its sorting network gather-free
    (4.5 ms for 8 x 650k operands on v5e, vs ~10 ms for a single 650k
    XLA gather).

    The sorts run on a static PREFIX of the stream chosen by `total`:
    K1's global compaction already packs all candidates into [0, total),
    so a lax.cond ladder picks the smallest static size that holds
    them — diffuse bounces (2-20% candidacy) pay for small-prefix
    sorts, not pool-sized ones.

    Mirrors the reference's acceleration-structure menu item
    (/root/reference/INSTRUCTION.md:133-140) as a TPU-native design:
    traversal order comes from a device-wide sort instead of a per-ray
    stack, because the TPU has no per-lane gather but a fast
    multi-operand sorting network."""
    from .megakernel import _mat3vec, _mesh_epilogue, _normalize3

    dense_rows = res_outs[0].shape[0]
    N = dense_rows * LANE
    f = lambda a: a.reshape(-1)
    ox, oy, oz, dx, dy, dz, seed = (f(d) for d in d_outs)
    best_t, bnx, bny, bnz, bout, bmat = (f(r) for r in res_outs[:6])
    if want_uv:
        btu, btv, bhuv = (f(r) for r in res_outs[6:9])
    valid = jnp.arange(N, dtype=jnp.int32) < total
    nres = 5 if want_uv else 3

    r8 = lambda r: max(8, -(-r // 8) * 8)
    # Rung granularity is sort size: the sorts dominate the sorted
    # path (tools/breakdown_bigmesh.py: payload movement alone is
    # ~50% of the mesh_big frame), so the ladder is fine at BOTH ends
    # — //64 and //32 for deep bounces (candidacy 2-5%), and 3/8, 1/2,
    # 3/4 rungs so a ~30% primary bounce doesn't pay the full-pool
    # sort (the old //4 -> full jump was 4x).
    caps = sorted({r8(dense_rows // 64), r8(dense_rows // 32),
                   r8(dense_rows // 16), r8(dense_rows // 8),
                   r8(dense_rows // 4), r8(3 * dense_rows // 8),
                   r8(dense_rows // 2), r8(3 * dense_rows // 4),
                   dense_rows})

    for i in sorted_ids:
        inv_i = tuple(inv[i, k] for k in range(16))
        xf_i = tuple(xf[i, k] for k in range(16))
        invt_i = tuple(invt[i, k] for k in range(16))
        (ss, sn, cs, cn, ts, tc, aabb) = mesh_meta[i]
        eff = jnp.where(
            best_t > 0,
            jnp.where(seed > 0, jnp.minimum(best_t, seed), best_t),
            seed,
        )
        qox, qoy, qoz = _mat3vec(inv_i, ox, oy, oz, 1.0)
        qdx, qdy, qdz = _mat3vec(inv_i, dx, dy, dz, 0.0)
        qdx, qdy, qdz = _normalize3(qdx, qdy, qdz)
        fro = jnp.sqrt(
            inv_i[0] * inv_i[0] + inv_i[1] * inv_i[1]
            + inv_i[2] * inv_i[2]
            + inv_i[4] * inv_i[4] + inv_i[5] * inv_i[5]
            + inv_i[6] * inv_i[6]
            + inv_i[8] * inv_i[8] + inv_i[9] * inv_i[9]
            + inv_i[10] * inv_i[10]
        )
        bt0 = jnp.where(eff > 0, eff * fro, jnp.float32(FLT_MAX))
        bt0 = jnp.where(valid, bt0, jnp.float32(-FLT_MAX))

        def traverse(cap_rows):
            capn = cap_rows * LANE
            E = SORT_EXPAND
            sl = lambda a: a[:capn]
            q6 = tuple(sl(a) for a in (qox, qoy, qoz, qdx, qdy, qdz))
            btc = sl(bt0)

            def windows_sweep(key_s, q_s, srows):
                """Windows -> per-super window sweep over a sorted
                stream of srows*LANE entries; returns the swept bstk.
                Shared verbatim by every path (the sweep is per-entry
                independent, so stream length and entry order never
                change any entry's result)."""
                rng = jnp.arange(2 * sn, dtype=key_s.dtype)
                lo_l = jnp.searchsorted(key_s, rng, side="left").astype(
                    jnp.int32
                )
                hi_l = jnp.searchsorted(key_s, rng, side="right").astype(
                    jnp.int32
                )
                blk_l = 8 * LANE
                lo_r = lo_l // blk_l
                hi_r = (hi_l + blk_l - 1) // blk_l
                r2d = lambda a: a.reshape(srows, LANE)
                qstk = jnp.concatenate([r2d(a) for a in q_s], axis=1)
                bstk = jnp.concatenate(
                    [jnp.full((srows, LANE), FLT_MAX, jnp.float32),
                     jnp.zeros((srows, nres * LANE), jnp.float32)],
                    axis=1,
                )
                if "nosweep" in SORT_ABLATE:  # timing probe
                    return bstk
                return _window_sweep(
                    lo_r, hi_r, lo_l, hi_l, qstk, bstk, tri, chunks,
                    scene.mesh_attr_slabs, mesh_meta[i], interpret,
                    want_uv, stream,
                )

            def sweep_unsort(key_s, idx_s, q_s, srows):
                """windows_sweep -> unsort-by-idx (the bitonic unsort
                used by the full path and the compacted-bitonic path;
                the radix path inverts its permutation structurally
                instead)."""
                bstk2 = windows_sweep(key_s, q_s, srows)
                bsl = lambda j: (
                    bstk2[:, j * LANE:(j + 1) * LANE].reshape(-1)
                )
                # idx_s is a permutation (all keys distinct), so an
                # unstable sort is already deterministic — skip the
                # stability machinery.
                if "nosort2" in SORT_ABLATE:  # timing probe
                    back = [bsl(0)] + [bsl(1 + j) for j in range(nres)]
                elif SORT_PACK64:
                    # 2 operands (3 with UV) instead of 5 (7): bt rides
                    # FREE inside the u64 unsort key (idx_s << 32 |
                    # bt_bits — idx_s is unique so the bt bits never
                    # decide the order), and the result payloads pack in
                    # f32 pairs.
                    with jax.enable_x64(True):
                        k2 = (
                            idx_s.astype(jnp.uint64) << jnp.uint64(32)
                        ) | lax.bitcast_convert_type(
                            bsl(0), jnp.uint32
                        ).astype(jnp.uint64)
                        rs = [bsl(1 + j) for j in range(nres)]
                        if nres == 3:
                            ops = [k2, _pack2_u64(rs[0], rs[1]), rs[2]]
                        else:
                            ops = [k2, _pack2_u64(rs[0], rs[1]),
                                   _pack2_u64(rs[2], rs[3]), rs[4]]
                        srt = lax.sort(ops, num_keys=1, is_stable=False)
                        bt_b = lax.bitcast_convert_type(
                            (srt[0] & jnp.uint64(0xFFFFFFFF))
                            .astype(jnp.uint32),
                            jnp.float32,
                        )
                        r0, r1 = _unpack2_u64(srt[1])
                        if nres == 3:
                            back = [bt_b, r0, r1, srt[2]]
                        else:
                            r2, r3 = _unpack2_u64(srt[2])
                            back = [bt_b, r0, r1, r2, r3, srt[3]]
                else:
                    back = lax.sort(
                        [idx_s, bsl(0)]
                        + [bsl(1 + j) for j in range(nres)],
                        num_keys=1, is_stable=False,
                    )[1:]
                return back

            def run_stream(keys, E_s):
                """ONE full sorted-stream round over an E_s-slot entry
                stream: expand -> (compacted) global sort -> per-super
                window sweep -> unsort -> entry-major strict-< merge
                back to lanes; returns the per-lane (bt, res...)
                tuple. Factored so the SORT_SPILL split can run it
                twice (phase A: the single first-entered-super slot;
                phase B: the bounded spill slots) — per-entry sweep
                results are stream-size and order independent, so each
                phase computes exactly its slice of the one-round
                stream."""
                if "norank" in SORT_ABLATE:  # timing probe: rank DCEs
                    keys = [jnp.full_like(k, 2 * sn) for k in keys]
                key0 = (jnp.concatenate(keys) if len(keys) > 1
                        else keys[0])
                qe = (tuple(jnp.tile(a, E_s) for a in q6)
                      if E_s > 1 else q6)
                rows_e = E_s * cap_rows
                return _run_stream_body(E_s, key0, qe, rows_e)

            def _run_stream_body(E_s, key0, qe, rows_e):
                E = E_s  # shadow: stream slot count for this round

                def full_path(_):
                    # The sorts dominate this path, and sort cost scales
                    # with operand count (measured ~5.9 ms/frame per payload
                    # operand on mesh_big, tools/breakdown_bigmesh.py), so
                    # sort1 moves as little as possible:
                    # - when (dead+1)*stride fits int32, (key, entry) packs
                    #   into ONE sorted operand — packing preserves
                    #   (key, idx) lexicographic order and idx is unique, so
                    #   the order (and every downstream result) is
                    #   bit-identical to the stable two-key form;
                    # - the per-lane pruning bound bt0 is NOT a payload: the
                    #   sweep carry inits at +FLT_MAX and the post-merge
                    #   `hit = bt_u < bt0` check applies the bound per lane.
                    #   Exact: any recorded t >= bt0 only exists where no
                    #   entry beat bt0 (a merged min t0 < t1 < bt0 cannot be
                    #   out-of-bound), and those lanes were no-hit under the
                    #   bt0-seeded carry too; strict-< tie order is
                    #   unchanged.
                    idx0 = jnp.arange(E * capn, dtype=jnp.int32)
                    stride = E * capn
                    packed_ok = (2 * sn + 1) * stride <= 2**31 - 1
                    if "nosort1" in SORT_ABLATE:
                        # timing probe: key-only sort (real windows), the 6
                        # payload operands skip the network
                        if packed_ok:
                            p = lax.sort(
                                [key0 * stride + idx0], num_keys=1,
                                is_stable=False,
                            )[0]
                            key_s = p // stride
                            idx_s = p % stride
                        else:
                            key_s, idx_s = lax.sort(
                                [key0, idx0], num_keys=1, is_stable=True,
                            )
                        q_s = qe
                    elif SORT_PACK64:
                        # 4 operands instead of 7: the u64 key is
                        # (key0 << 32) | idx0 — lexicographically identical
                        # to the stable (key, idx) two-key sort, recovered
                        # by ONE shift and ONE mask (the first pack64
                        # attempt used key0*stride + idx0 and paid emulated
                        # u64 div/mod on TPU: 137.7 vs 133.9 ms/frame on
                        # mesh_big) — and the six rays ride as f32 pairs
                        # bitcast into u64 words. lax.sort cost is
                        # operand-overhead-bound (tools/bench_sort.py:
                        # key + 6 f32 = 5.79 ms vs key + 3 u64 = 2.77 ms at
                        # 480k), so fewer, wider operands win.
                        with jax.enable_x64(True):
                            k64 = (
                                key0.astype(jnp.uint64) << jnp.uint64(32)
                            ) | idx0.astype(jnp.uint64)
                            srt = lax.sort(
                                [k64, _pack2_u64(qe[0], qe[1]),
                                 _pack2_u64(qe[2], qe[3]),
                                 _pack2_u64(qe[4], qe[5])],
                                num_keys=1, is_stable=False,
                            )
                            q0s, q1s = _unpack2_u64(srt[1])
                            q2s, q3s = _unpack2_u64(srt[2])
                            q4s, q5s = _unpack2_u64(srt[3])
                            q_s = (q0s, q1s, q2s, q3s, q4s, q5s)
                            key_s = (srt[0] >> jnp.uint64(32)).astype(
                                jnp.int32
                            )
                            idx_s = (
                                srt[0] & jnp.uint64(0xFFFFFFFF)
                            ).astype(jnp.int32)
                    elif packed_ok:
                        srt = lax.sort(
                            [key0 * stride + idx0, *qe],
                            num_keys=1, is_stable=False,
                        )
                        key_s = srt[0] // stride
                        idx_s = srt[0] % stride
                        q_s = srt[1:7]
                    else:
                        srt = lax.sort(
                            [key0, idx0, *qe], num_keys=1, is_stable=True,
                        )
                        key_s, idx_s = srt[0], srt[1]
                        q_s = srt[2:8]
                    return tuple(sweep_unsort(key_s, idx_s, q_s, rows_e))

                # COMPACTED EXPANSION (SORT_COMPACT): drop the dead-sentinel
                # entries (mean real occupancy 2.5 of E=6 slots on mesh_big)
                # from the stream BEFORE the two global sorts. The sorts are
                # bandwidth-bound at frame-dominant sizes (docs/ANALYSIS.md
                # "Sort-operand packing"), so element count is the lever:
                # _kc_compact packs real entries per tile, _ks_stitch builds
                # the dense half-size prefix, the sweep runs on the smaller
                # stream (per-entry independent => bit-identical), the
                # unsort (by the carried entry-major idx) restores compacted
                # order, and _kx_expand routes results back to entry-major
                # for the unchanged strict-< merge. Overflow (real entries
                # > the half-size prefix — rare; aggregate occupancy
                # concentrates near its 0.42 mean) falls back to full_path,
                # bit-identically. Gated on 2*N_e <= 2**24 so the
                # entry-major indices survive the f32 routing network and
                # the stitch's tail indices stay exact.
                rows_ep = -(-rows_e // TILE_ROWS) * TILE_ROWS
                N_e = rows_ep * LANE
                use_compact = SORT_COMPACT and 2 * N_e <= 2**24
                if use_compact:
                    dead = 2 * sn
                    pad_e = N_e - E * capn
                    padv = lambda a, v: (
                        a if pad_e == 0
                        else jnp.concatenate(
                            [a, jnp.full((pad_e,), v, a.dtype)]
                        )
                    )
                    keyf = padv(key0.astype(jnp.float32), float(dead))
                    qep = tuple(
                        padv(a, 1.0 if j == 5 else 0.0)
                        for j, a in enumerate(qe)
                    )
                    packed8, counts_e = _kc_compact(
                        keyf, qep, dead, interpret
                    )
                    csum_e = jnp.cumsum(counts_e)
                    goffe = csum_e - counts_e
                    r_tot = csum_e[counts_e.shape[0] - 1]
                    cap_c_rows = max(
                        TILE_ROWS,
                        -(-(rows_ep // 2) // TILE_ROWS) * TILE_ROWS,
                    )
                    cap_cn = cap_c_rows * LANE

                    def compact_path(_):
                        dense8 = _ks_stitch(
                            packed8, goffe, counts_e, csum_e,
                            cap_c_rows, dead, N_e, interpret,
                        )
                        if SORT_RADIX and not SORT_ABLATE:
                            # linear-pass radix replaces BOTH lax.sorts:
                            # stable LSB partitions sort (key asc, input
                            # order preserved) == the packed (key, idx)
                            # sort on this ascending-idx stream, and the
                            # unsort inverts each pass structurally — idx
                            # never rides at all.
                            bits = max(1, int(2 * sn).bit_length())
                            sorted7, stages = _radix_sort_stream(
                                [dense8[0], *dense8[2:8]], bits, interpret,
                            )
                            key_s = (
                                sorted7[0].reshape(-1).astype(jnp.int32)
                            )
                            q_s = tuple(
                                a.reshape(-1) for a in sorted7[1:7]
                            )
                            bstk2 = windows_sweep(key_s, q_s, cap_c_rows)
                            b2d = [
                                bstk2[:, j * LANE:(j + 1) * LANE]
                                for j in range(1 + nres)
                            ]
                            back_c = [
                                a.reshape(-1)
                                for a in _radix_unsort_stream(
                                    b2d, stages, interpret
                                )
                            ]
                            padw = jnp.zeros(
                                (WIN_ROWS, LANE), jnp.float32
                            )
                            back_p = [
                                jnp.concatenate(
                                    [a.reshape(cap_c_rows, LANE), padw]
                                )
                                for a in back_c
                            ]
                            exp = _kx_expand(
                                keyf, goffe, counts_e, back_p, dead,
                                interpret,
                            )
                            return tuple(
                                a.reshape(-1)[:E * capn] for a in exp
                            )
                        keyd = dense8[0].reshape(-1).astype(jnp.int32)
                        idxd = dense8[1].reshape(-1).astype(jnp.int32)
                        qd = tuple(a.reshape(-1) for a in dense8[2:8])
                        stride2 = 2 * N_e
                        packed_ok2 = (
                            2 * sn * stride2 + 2 * N_e <= 2**31 - 1
                        )
                        if "nosort1" in SORT_ABLATE:  # timing probe
                            if packed_ok2:
                                p = lax.sort(
                                    [keyd * stride2 + idxd], num_keys=1,
                                    is_stable=False,
                                )[0]
                                key_s = p // stride2
                                idx_s = p % stride2
                            else:
                                key_s, idx_s = lax.sort(
                                    [keyd, idxd], num_keys=1,
                                    is_stable=True,
                                )
                            q_s = qd
                        elif packed_ok2:
                            srt = lax.sort(
                                [keyd * stride2 + idxd, *qd],
                                num_keys=1, is_stable=False,
                            )
                            key_s = srt[0] // stride2
                            idx_s = srt[0] % stride2
                            q_s = srt[1:7]
                        else:
                            srt = lax.sort(
                                [keyd, idxd, *qd], num_keys=1,
                                is_stable=True,
                            )
                            key_s, idx_s = srt[0], srt[1]
                            q_s = srt[2:8]
                        back_c = sweep_unsort(key_s, idx_s, q_s, cap_c_rows)
                        padw = jnp.zeros((WIN_ROWS, LANE), jnp.float32)
                        back_p = [
                            jnp.concatenate(
                                [a.reshape(cap_c_rows, LANE), padw]
                            )
                            for a in back_c
                        ]
                        exp = _kx_expand(
                            keyf, goffe, counts_e, back_p, dead, interpret
                        )
                        return tuple(
                            a.reshape(-1)[:E * capn] for a in exp
                        )

                    back = lax.cond(
                        r_tot <= cap_cn, compact_path, full_path, None
                    )
                else:
                    back = full_path(None)
                # entry j of lane l sits at j*capn + l: min-merge across E.
                # j ascends = entered-super order ascends, and updates are
                # strict-<, so ties resolve exactly as the dense sweep's
                # in-index-order traversal (bit-identical merge).
                res = [a.reshape(E, capn) for a in back]
                bt_m = res[0][0]
                rest_m = [r[0] for r in res[1:]]
                for j in range(1, E):
                    better = res[0][j] < bt_m
                    rest_m = [jnp.where(better, r[j], cur)
                              for r, cur in zip(res[1:], rest_m)]
                    bt_m = jnp.where(better, res[0][j], bt_m)
                return (bt_m, *rest_m)

            if SORT_SPILL:
                # First-super + bounded spill split (see the flag
                # comment): phase A sweeps one window entry per lane,
                # phase B only the supers still able to beat
                # min(bt0, phase-A best). Strict-< keeps phase A on
                # ties — A's super index is the lane's lowest, so the
                # combined order equals the dense sweep's.
                first = _super_rank_first(supers, ss, sn, *q6, btc)
                res_a = run_stream([first], 1)
                bound = jnp.minimum(btc, res_a[0])
                e_b = max(1, E - 1)
                keys_b = _super_rank_xla(
                    supers, ss, sn, e_b, *q6, bound, min_super=first,
                )
                res_b = run_stream(keys_b, e_b)
                better = res_b[0] < res_a[0]
                bt_m = jnp.where(better, res_b[0], res_a[0])
                rest_m = [jnp.where(better, b, a)
                          for a, b in zip(res_a[1:], res_b[1:])]
            else:
                keys = _super_rank_xla(supers, ss, sn, E, *q6, btc)
                out_m = run_stream(keys, E)
                bt_m, rest_m = out_m[0], list(out_m[1:])
            pad = N - capn
            padf = lambda a, v: (
                a if pad == 0
                else jnp.concatenate(
                    [a, jnp.full((pad,), v, jnp.float32)]
                )
            )
            return tuple(
                padf(a, FLT_MAX if j == 0 else 0.0)
                for j, a in enumerate([bt_m] + rest_m)
            )

        # smallest static prefix that holds all candidates
        branch = lambda cap: (lambda _: traverse(cap))
        fn = branch(caps[-1])
        for cap in reversed(caps[:-1]):
            fn = (
                lambda cap, nxt: lambda _: lax.cond(
                    total <= cap * LANE, branch(cap), nxt, None
                )
            )(cap, fn)
        res_g = fn(None)

        bt_u = res_g[0]
        rr_u = res_g[1:]
        hit = (bt_u < FLT_MAX) & (bt_u < bt0)
        t_g, nwx, nwy, nwz, outs_g = _mesh_epilogue(
            xf_i, invt_i, ox, oy, oz, dx, dy, dz,
            qox, qoy, qoz, qdx, qdy, qdz,
            bt_u, rr_u[0], rr_u[1], rr_u[2], hit,
        )
        prev = jnp.where(best_t > 0, best_t, FLT_MAX)
        better = (t_g > 0) & (prev > t_g)
        best_t = jnp.where(better, t_g, best_t)
        bnx = jnp.where(better, nwx, bnx)
        bny = jnp.where(better, nwy, bny)
        bnz = jnp.where(better, nwz, bnz)
        bmat = jnp.where(better, gmat[i, 0].astype(jnp.float32), bmat)
        bout = jnp.where(better, jnp.where(outs_g, 1.0, 0.0), bout)
        if want_uv:
            g_has = 1.0 if scene.mesh_has_uv[i] else 0.0
            btu = jnp.where(better, rr_u[3], btu)
            btv = jnp.where(better, rr_u[4], btv)
            bhuv = jnp.where(better, jnp.float32(g_has), bhuv)

    out = [best_t, bnx, bny, bnz, bout, bmat]
    if want_uv:
        out += [btu, btv, bhuv]
    return tuple(a.reshape(dense_rows, LANE) for a in out)


def _mesh_geoms(scene):
    return tuple(
        i for i, gt in enumerate(scene.gtypes)
        if gt == int(GeomType.MESH) and scene.tri_ranges[i][1] > 0
    )


def _candidacy_union(scene, mesh_meta, inv_ref, super_ref,
                     ox, oy, oz, dx, dy, dz, seed_t, alive):
    """OR of per-geom candidacy over all mesh geoms — THE mask both K1
    and K3 derive independently (identical ops => identical bits)."""
    cand = None
    for i in _mesh_geoms(scene):
        inv = tuple(inv_ref[i, k] for k in range(16))
        (ss, sn, _cs, _cn, _ts, _tc, aabb) = mesh_meta[i]
        c_i, *_ = _mesh_candidacy(
            inv, aabb, super_ref, ss, sn,
            ox, oy, oz, dx, dy, dz, seed_bt=seed_t, active=alive,
        )
        cand = c_i if cand is None else (cand | c_i)
    return cand


def _specs_helpers(n_tiles):
    smem = lambda s: pl.BlockSpec(
        s, lambda i: (0,) * len(s), memory_space=pltpu.SMEM
    )
    vfull = lambda s: pl.BlockSpec(
        s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM
    )
    tile = pl.BlockSpec(
        (TILE_ROWS, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    anyspace = pl.BlockSpec(memory_space=pltpu.ANY)
    return smem, vfull, tile, anyspace


def _intersect_phase(origins, dirs, alive, scene, interpret, want_uv):
    """K1 + glue + K2: everything up to (but excluding) the per-lane
    route-back. Returns a dict with the analytic results, the dense
    mesh results, and the offset bookkeeping K3-style consumers need.

    want_uv: carry interpolated per-corner UVs (tri-table cols 18-23)
    through the sweep — the intersect entry needs them for file
    textures; the shading bounce does not (the in-kernel checker is
    3D-procedural)."""
    P = origins.x.shape[0]
    assert P % TILE_LANES == 0, f"pool size {P} not pipeline-tile-aligned"
    rows = P // LANE
    n_tiles = rows // TILE_ROWS

    mesh_meta = _mesh_meta(scene)
    mesh_ids = _mesh_geoms(scene)
    xf, inv, invt, gmat, mat, tri, chunks, supers, env = (
        _pack_scene_tables(scene)
    )
    smem, vfull, tile, anyspace = _specs_helpers(n_tiles)
    r2 = lambda a: a.reshape(rows, LANE)
    shape2d = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
    shape2i = jax.ShapeDtypeStruct((rows, LANE), jnp.int32)

    # ------------------------------------------------------------------
    # K1: analytic intersect + candidacy + per-tile pack
    # ------------------------------------------------------------------
    def k1(xf_ref, inv_ref, invt_ref, gmat_ref, super_ref,
           ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, alive_ref,
           at_o, anx_o, any_o, anz_o, aout_o, amat_o,
           pk0, pk1, pk2, pk3, pk4, pk5, pk6, counts_o):
        k = pl.program_id(0)
        av = alive_ref[:] != 0
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        at, anx, any_, anz, amat, aout_f = _intersect_all(
            scene.gtypes, mesh_meta, xf_ref, inv_ref, invt_ref, gmat_ref,
            None, None, super_ref,
            ox, oy, oz, dx, dy, dz, av, include_meshes=False,
        )
        at_o[:] = at
        anx_o[:] = anx
        any_o[:] = any_
        anz_o[:] = anz
        aout_o[:] = aout_f
        amat_o[:] = amat

        cand = _candidacy_union(
            scene, mesh_meta, inv_ref, super_ref,
            ox, oy, oz, dx, dy, dz, at, av,
        )
        routing = make_routing(cand)
        packed, _pmask, total = compact_tile(
            cand, [ox, oy, oz, dx, dy, dz, at], routing=routing
        )
        for ref, val in zip((pk0, pk1, pk2, pk3, pk4, pk5, pk6), packed):
            ref[:] = val
        counts_o[k] = total

    k1_outs = pl.pallas_call(
        k1,
        grid=(n_tiles,),
        in_specs=[
            smem(tuple(xf.shape)), smem(tuple(inv.shape)),
            smem(tuple(invt.shape)), smem(tuple(gmat.shape)),
            vfull(tuple(supers.shape)),
        ] + [tile] * 7,
        out_specs=[tile] * 13 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[shape2d] * 5 + [shape2i] + [shape2d] * 7
        + [jax.ShapeDtypeStruct((n_tiles,), jnp.int32)],
        interpret=interpret,
    )(
        xf, inv, invt, gmat, supers,
        r2(origins.x), r2(origins.y), r2(origins.z),
        r2(dirs.x), r2(dirs.y), r2(dirs.z),
        r2(alive.astype(jnp.int32)),
    )
    (at, anx, any_, anz, aout, amat,
     pk0, pk1, pk2, pk3, pk4, pk5, pk6, counts) = k1_outs

    # glue: global offsets (n_tiles-element XLA, negligible)
    csum = jnp.cumsum(counts)
    goff = csum - counts  # exclusive
    total = csum[n_tiles - 1]
    n_dense = (total + TILE_LANES - 1) // TILE_LANES

    # ------------------------------------------------------------------
    # K2: stitch dense tiles + full-width hierarchical sweep
    # ------------------------------------------------------------------
    dense_rows = rows + WIN_ROWS  # slack so K3's window DMA stays in range
    dshape = jax.ShapeDtypeStruct((dense_rows, LANE), jnp.float32)
    n_res = 9 if want_uv else 6

    from .megakernel import MAX_MK_TRIS, STREAM_ROWS, TRI_ROW

    stream = tri.shape[0] > MAX_MK_TRIS // TRI_ROW
    # Geoms past the sorted-stream threshold leave K2 entirely: K2 only
    # stitches the dense stream for them (exported as 7 extra outputs)
    # and _sorted_mesh_merge runs their traversal at the XLA boundary,
    # where a global multisort can reorder the stream by supernode.
    sorted_ids = tuple(
        i for i in mesh_ids if mesh_meta[i][5] > SORT_SUPER_MIN_TRIS
    )
    swept_ids = tuple(i for i in mesh_ids if i not in sorted_ids)

    def k2(goff_ref, cnt_ref, nd_ref,
           xf_ref, inv_ref, invt_ref, gmat_ref,
           tri_ref, chunk_ref, super_ref,
           p0, p1, p2, p3, p4, p5, p6,
           *rest):
        outs = rest[:n_res]
        pos = n_res
        if sorted_ids:
            dense_refs = rest[pos:pos + 7]
            pos += 7
        src_refs = rest[pos:pos + 7]
        pos += 7
        if not sorted_ids:
            dense_refs = rest[pos:pos + 7]
            pos += 7
        r0, r1, r2, r3, r4 = rest[pos:pos + 5]
        pos += 5
        tri_buf = rest[pos] if stream else None
        sem = rest[-1]
        d = pl.program_id(0)
        s0, s1, s2, s3, s4, s5, s6 = src_refs
        pk_refs = (p0, p1, p2, p3, p4, p5, p6)

        def init_dense():
            zero = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
            for j, ref in enumerate(dense_refs):
                if j == 5:  # dz slot: unit direction for slack lanes
                    ref[:] = zero + 1.0
                elif j == 6:  # seed-t slot: dead bound
                    ref[:] = zero - FLT_MAX
                else:
                    ref[:] = zero

        if sorted_ids:
            # dense tiles are OUTPUTS consumed by XLA: every grid step
            # must write deterministic values, including tiles past the
            # live count (their seed-t = -FLT_MAX keys them exhausted).
            init_dense()

        @pl.when(d < nd_ref[0])
        def _():
            base = d * TILE_LANES
            if not sorted_ids:
                init_dense()
            fp = (
                lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 0) * LANE
                + lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 1)
            )

            def src_body(k, _):
                gk = goff_ref[k]
                ck = cnt_ref[k]
                overlap = jnp.logical_and(
                    jnp.logical_and(gk < base + TILE_LANES, ck > 0),
                    gk + ck > base,
                )

                @pl.when(overlap)
                def _():
                    s = gk - base  # signed shift of this region's stream
                    sm = s % TILE_LANES
                    m = (fp >= s) & (fp < s + ck)
                    for pk_ref, s_ref, d_ref in zip(
                        pk_refs, src_refs, dense_refs
                    ):
                        cp = pltpu.make_async_copy(
                            pk_ref.at[pl.ds(k * TILE_ROWS, TILE_ROWS), :],
                            s_ref,
                            sem,
                        )
                        cp.start()
                        cp.wait()
                        d_ref[:] = jnp.where(
                            m, _flat_roll(s_ref[:], sm), d_ref[:]
                        )
                return 0

            lax.fori_loop(0, n_tiles, src_body, 0)

            ox, oy, oz = dense_refs[0][:], dense_refs[1][:], dense_refs[2][:]
            dx, dy, dz = dense_refs[3][:], dense_refs[4][:], dense_refs[5][:]
            seed = dense_refs[6][:]
            best_t = jnp.full((TILE_ROWS, LANE), -1.0, jnp.float32)
            bnx = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
            bny = jnp.zeros_like(bnx)
            bnz = jnp.zeros_like(bnx)
            bmat = jnp.full((TILE_ROWS, LANE), -1, jnp.int32)
            bout = jnp.ones((TILE_ROWS, LANE), jnp.float32)
            btu = jnp.zeros_like(bnx)
            btv = jnp.zeros_like(bnx)
            bhuv = jnp.zeros_like(bnx)
            for i in swept_ids:
                xf_i = tuple(xf_ref[i, k] for k in range(16))
                inv_i = tuple(inv_ref[i, k] for k in range(16))
                invt_i = tuple(invt_ref[i, k] for k in range(16))
                (ss, sn, cs, cn, ts, tc, aabb) = mesh_meta[i]
                # seed = min(analytic, mesh-geoms-so-far), -1 conventions
                eff = jnp.where(
                    best_t > 0,
                    jnp.where(seed > 0, jnp.minimum(best_t, seed), best_t),
                    seed,
                )
                cand_g, qox, qoy, qoz, qdx, qdy, qdz, bt0 = _mesh_candidacy(
                    inv_i, aabb, super_ref, ss, sn,
                    ox, oy, oz, dx, dy, dz, seed_bt=eff, active=None,
                )
                bt0 = jnp.where(cand_g, bt0, jnp.float32(-FLT_MAX))
                # The GROUP_SUPER_MIN knob re-enables the
                # measured-negative geometric-cond experiment for
                # comparison (docs/ANALYSIS.md "Big-mesh sweeps");
                # default is the full-width chunk-major sweep.
                if tc > GROUP_SUPER_MIN_TRIS:
                    q_refs = (s0, s1, s2, s3, s4, s5, s6)
                    for ref, val in zip(
                        q_refs, (qox, qoy, qoz, qdx, qdy, qdz, bt0)
                    ):
                        ref[:] = val
                    res_refs = (r0, r1, r2) + ((r3, r4) if want_uv else ())
                    zres = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
                    for ref in res_refs:
                        ref[:] = zres
                    _mesh_sweep_super(
                        tri_ref, stream, chunk_ref, super_ref,
                        ss, sn, cs, cn, ts, tc,
                        q_refs, res_refs, tri_buf, sem,
                        want_uv=want_uv,
                    )
                    sweep = (s6[:],) + tuple(ref[:] for ref in res_refs)
                elif stream:
                    sweep = _mesh_sweep_stream(
                        tri_ref, chunk_ref, super_ref,
                        ss, sn, cs, cn, ts, tc,
                        qox, qoy, qoz, qdx, qdy, qdz, bt0,
                        tri_buf, sem, want_uv=want_uv,
                    )
                else:
                    sweep = _mesh_sweep_block(
                        tri_ref, chunk_ref, super_ref,
                        ss, sn, cs, cn, ts, tc,
                        qox, qoy, qoz, qdx, qdy, qdz, bt0,
                        want_uv=want_uv,
                    )
                if want_uv:
                    bt, nx_, ny_, nz_, tu_, tv_ = sweep
                else:
                    bt, nx_, ny_, nz_ = sweep
                hit = (bt < FLT_MAX) & (bt < bt0)
                t_g, nwx, nwy, nwz, outs_g = _mesh_epilogue(
                    xf_i, invt_i, ox, oy, oz, dx, dy, dz,
                    qox, qoy, qoz, qdx, qdy, qdz, bt, nx_, ny_, nz_, hit,
                )
                prev = jnp.where(best_t > 0, best_t, FLT_MAX)
                better = (t_g > 0) & (prev > t_g)
                best_t = jnp.where(better, t_g, best_t)
                bnx = jnp.where(better, nwx, bnx)
                bny = jnp.where(better, nwy, bny)
                bnz = jnp.where(better, nwz, bnz)
                bmat = jnp.where(better, gmat_ref[i, 0], bmat)
                bout = jnp.where(
                    better, jnp.where(outs_g, 1.0, 0.0), bout
                )
                if want_uv:
                    g_has = 1.0 if scene.mesh_has_uv[i] else 0.0
                    btu = jnp.where(better, tu_, btu)
                    btv = jnp.where(better, tv_, btv)
                    bhuv = jnp.where(better, jnp.float32(g_has), bhuv)
            res = [best_t, bnx, bny, bnz, bout,
                   bmat.astype(jnp.float32)]
            if want_uv:
                res += [btu, btv, bhuv]
            for o_ref, val in zip(outs, res):
                o_ref[:] = val

    dense_tile = pl.BlockSpec(
        (TILE_ROWS, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    n_outs = n_res + (7 if sorted_ids else 0)
    # scratch: 7 stitch (+7 dense when not exported as outputs) + 5
    # sweep-result tiles (32 KB each), the streamed super buffer and
    # one DMA semaphore
    n_scratch = (12 if sorted_ids else 19)
    k2_outs = pl.pallas_call(
        k2,
        grid=(n_tiles,),
        in_specs=[
            smem((n_tiles,)), smem((n_tiles,)), smem((1,)),
            smem(tuple(xf.shape)), smem(tuple(inv.shape)),
            smem(tuple(invt.shape)), smem(tuple(gmat.shape)),
            (anyspace if stream else vfull(tuple(tri.shape))),
            vfull(tuple(chunks.shape)),
            vfull(tuple(supers.shape)),
        ] + [anyspace] * 7,
        out_specs=[dense_tile] * n_outs,
        out_shape=[dshape] * n_outs,
        scratch_shapes=[pltpu.VMEM((TILE_ROWS, LANE), jnp.float32)]
        * n_scratch
        + (
            [pltpu.VMEM((STREAM_ROWS, tri.shape[1]), jnp.float32)]
            if stream else []
        )
        + [pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(
        goff, counts, n_dense.reshape(1),
        xf, inv, invt, gmat, tri, chunks, supers,
        pk0, pk1, pk2, pk3, pk4, pk5, pk6,
    )
    if sorted_ids:
        dense_res = _sorted_mesh_merge(
            scene, mesh_meta, sorted_ids,
            xf, inv, invt, gmat, tri, chunks, supers,
            k2_outs[n_res:n_res + 7], k2_outs[:n_res], total,
            want_uv, interpret, stream,
        )
    else:
        dense_res = tuple(k2_outs[:n_res])

    return dict(
        analytic=(at, anx, any_, anz, aout, amat),
        dense=dense_res,
        goff=goff,
        counts=counts,
        tables=(xf, inv, invt, gmat, mat, supers, env),
        mesh_meta=mesh_meta,
        rows=rows,
        n_tiles=n_tiles,
        shape2d=shape2d,
        shape2i=shape2i,
    )


def _routeback_and_merge(scene, mesh_meta, inv_ref, super_ref,
                         goff_ref, cnt_ref, k,
                         ox, oy, oz, dx, dy, dz, av,
                         analytic_vals, dense_ins, win_refs, merge_refs,
                         sem):
    """Shared K3 front half: recompute candidacy+routing, DMA the dense
    result window, inverse-route, merge with the analytic results into
    merge_refs (pre-loaded with the analytic values by the caller)."""
    at = analytic_vals[0]
    ck = cnt_ref[k]

    @pl.when(ck > 0)
    def _():
        cand = _candidacy_union(
            scene, mesh_meta, inv_ref, super_ref,
            ox, oy, oz, dx, dy, dz, at, av,
        )
        routing = make_routing(cand)
        w0 = goff_ref[k]
        r0 = w0 // LANE
        c0 = w0 - r0 * LANE
        for src, wref in zip(dense_ins, win_refs):
            cp = pltpu.make_async_copy(
                src.at[pl.ds(r0, WIN_ROWS), :], wref, sem
            )
            cp.start()
            cp.wait()
        back = (WIN_ROWS * LANE - c0) % (WIN_ROWS * LANE)
        # Zero everything past this tile's ck valid positions: the
        # window DMA may have read rows K2 never wrote (beyond the last
        # dense tile), and uninitialized VMEM can hold NaN/Inf on real
        # hardware — which would poison the 0/1 routing matmul below
        # (0 * NaN = NaN). Interpret mode zero-fills, so only the TPU
        # sees this (round-3 mesh_textured NaN incident).
        fp = (
            lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 0) * LANE
            + lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANE), 1)
        )
        locs = [
            jnp.where(fp < ck, _flat_roll(wref[:], back)[0:TILE_ROWS, :], 0.0)
            for wref in win_refs
        ]
        expanded = expand_tile(cand, locs, routing=routing)
        emt = expanded[0]
        prev = jnp.where(at > 0, at, FLT_MAX)
        better = cand & (emt > 0) & (prev > emt)
        for mref, val in zip(merge_refs, expanded):
            mref[:] = jnp.where(better, val, mref[:])


@functools.partial(jax.jit, static_argnames=("settings", "interpret"))
def bounce_step_pipeline(
    state, scene, iteration, depth, settings, interpret=False
):
    """Drop-in replacement for bounce_step_pallas on mesh scenes.

    state = (origins, dirs, throughput, radiance, alive, pix) with Vec3
    lanes; P must be a multiple of 64*128 (trace_paths pads)."""
    origins, dirs, throughput, radiance, alive, pix = state
    P = pix.shape[0]

    slots = _draw_slots(
        scene.any_partial_reflective,
        scene.any_refractive,
        settings.russian_roulette,
    )
    n_mat = int(scene.mat_emittance.shape[0])

    # mesh-UV file-texture scenes carry interpolated per-corner UVs
    # through the dense stream so K3's in-kernel texture fetch can
    # honor the OBJ parameterization (ops/texture.py::pick_uv)
    want_uv = (
        scene.n_file_textures > 0 or scene.any_bump
    ) and any(scene.mesh_has_uv[i] for i in _mesh_geoms(scene))
    ND = 9 if want_uv else 6
    ph = _intersect_phase(
        origins, dirs, alive, scene, interpret, want_uv=want_uv
    )
    at, anx, any_, anz, aout, amat = ph["analytic"]
    dense = ph["dense"]
    xf, inv, invt, gmat, mat, supers, env = ph["tables"]
    texa, bmp = _pack_tex_atlases(scene)
    emap = _pack_env_atlas(scene)
    ftex = scene.n_file_textures > 0
    btex = scene.any_bump
    mesh_meta = ph["mesh_meta"]
    rows, n_tiles = ph["rows"], ph["n_tiles"]
    smem, vfull, tile, anyspace = _specs_helpers(n_tiles)
    r2 = lambda a: a.reshape(rows, LANE)

    def k3(it_ref, depth_ref, goff_ref, cnt_ref,
           xf_ref, inv_ref, invt_ref, gmat_ref, mat_ref, env_ref,
           texa_ref, bmp_ref, emap_ref,
           super_ref, *rest):
        # *rest layout (ND = 6, or 9 with UVs): ND dense K2 results,
        # 14 state tiles, 6 analytic results, 13 outputs, ND window
        # scratch, ND merge scratch, DMA semaphore — same convention
        # as intersect_pipeline's k3i.
        dense_ins = rest[:ND]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tx_ref, ty_ref, tz_ref, rx_ref, ry_ref, rz_ref,
         alive_ref, pix_ref) = rest[ND:ND + 14]
        (at_ref, anx_ref, any_ref, anz_ref, aout_ref, amat_ref) = (
            rest[ND + 14:ND + 20]
        )
        (n_ox, n_oy, n_oz, n_dx, n_dy, n_dz,
         n_tx, n_ty, n_tz, n_rx, n_ry, n_rz, n_alive) = (
            rest[ND + 20:ND + 33]
        )
        wins = rest[ND + 33:ND + 33 + ND]
        gs = rest[ND + 33 + ND:ND + 33 + 2 * ND]
        sem = rest[-1]
        (g0, g1, g2, g3, g4, g5) = gs[:6]
        k = pl.program_id(0)
        tile_active = jnp.any(alive_ref[:] != 0)

        @pl.when(tile_active)
        def _():
            av = alive_ref[:] != 0
            ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
            dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
            at = at_ref[:]
            # merged isect scratch, pre-loaded with the analytic result
            # (order matches K2's dense outputs: t, nx, ny, nz, out, mat)
            g0[:] = at
            g1[:] = anx_ref[:]
            g2[:] = any_ref[:]
            g3[:] = anz_ref[:]
            g4[:] = aout_ref[:]
            g5[:] = amat_ref[:].astype(jnp.float32)
            if want_uv:
                zero = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
                gs[6][:] = zero
                gs[7][:] = zero
                gs[8][:] = zero
            _routeback_and_merge(
                scene, mesh_meta, inv_ref, super_ref,
                goff_ref, cnt_ref, k,
                ox, oy, oz, dx, dy, dz, av,
                (at,), dense_ins, wins, gs, sem,
            )
            st = (
                ox, oy, oz, dx, dy, dz,
                tx_ref[:], ty_ref[:], tz_ref[:],
                rx_ref[:], ry_ref[:], rz_ref[:],
                av, pix_ref[:],
            )
            isect = (
                g0[:], g1[:], g2[:], g3[:],
                g5[:].astype(jnp.int32), g4[:],
            ) + ((gs[6][:], gs[7][:], gs[8][:]) if want_uv else ())
            out = _shade_values(
                scene.gtypes, n_mat, slots, settings.rr_start_depth,
                it_ref[0, 0], depth_ref[0, 0],
                xf_ref, inv_ref, invt_ref, gmat_ref, mat_ref,
                st, isect,
                any_glossy=scene.any_glossy,
                stratified=settings.stratified,
                sobol=settings.sobol,
                env_ref=env_ref,
                has_env=scene.has_env_const,
                checker=checker_only(scene),
                file_tex=ftex, bump_tex=btex,
                tex_refs=(texa_ref, bmp_ref),
                env_map=scene.has_env_map, envmap_ref=emap_ref,
            )
            (nox, noy, noz, ndx, ndy, ndz,
             ntx, nty, ntz, nrx, nry, nrz, ncont, _npix) = out
            n_ox[:] = nox
            n_oy[:] = noy
            n_oz[:] = noz
            n_dx[:] = ndx
            n_dy[:] = ndy
            n_dz[:] = ndz
            n_tx[:] = ntx
            n_ty[:] = nty
            n_tz[:] = ntz
            n_rx[:] = nrx
            n_ry[:] = nry
            n_rz[:] = nrz
            n_alive[:] = jnp.where(ncont, 1, 0)

        @pl.when(jnp.logical_not(tile_active))
        def _():
            n_ox[:] = ox_ref[:]
            n_oy[:] = oy_ref[:]
            n_oz[:] = oz_ref[:]
            n_dx[:] = dx_ref[:]
            n_dy[:] = dy_ref[:]
            n_dz[:] = dz_ref[:]
            n_tx[:] = tx_ref[:]
            n_ty[:] = ty_ref[:]
            n_tz[:] = tz_ref[:]
            n_rx[:] = rx_ref[:]
            n_ry[:] = ry_ref[:]
            n_rz[:] = rz_ref[:]
            n_alive[:] = alive_ref[:]

    shape2d, shape2i = ph["shape2d"], ph["shape2i"]
    k3_outs = pl.pallas_call(
        k3,
        grid=(n_tiles,),
        in_specs=[
            smem((1, 1)), smem((1, 1)),
            smem((n_tiles,)), smem((n_tiles,)),
            smem(tuple(xf.shape)), smem(tuple(inv.shape)),
            smem(tuple(invt.shape)), smem(tuple(gmat.shape)),
            smem(tuple(mat.shape)), smem((1, 4)),
            vfull(tuple(texa.shape)), vfull(tuple(bmp.shape)),
            vfull(tuple(emap.shape)),
            vfull(tuple(supers.shape)),
        ] + [anyspace] * ND + [tile] * 14 + [tile] * 6,
        out_specs=[tile] * 13,
        out_shape=[shape2d] * 12 + [shape2i],
        scratch_shapes=[pltpu.VMEM((WIN_ROWS, LANE), jnp.float32)] * ND
        + [pltpu.VMEM((TILE_ROWS, LANE), jnp.float32)] * ND
        + [pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(
        jnp.asarray(iteration, jnp.int32).reshape(1, 1),
        jnp.asarray(depth, jnp.int32).reshape(1, 1),
        ph["goff"], ph["counts"],
        xf, inv, invt, gmat, mat, env, texa, bmp,
        emap, supers,
        *dense,
        r2(origins.x), r2(origins.y), r2(origins.z),
        r2(dirs.x), r2(dirs.y), r2(dirs.z),
        r2(throughput.x), r2(throughput.y), r2(throughput.z),
        r2(radiance.x), r2(radiance.y), r2(radiance.z),
        r2(alive.astype(jnp.int32)), r2(pix),
        at, anx, any_, anz, aout, amat,
    )

    flat = lambda a: a.reshape(P)
    return (
        Vec3(flat(k3_outs[0]), flat(k3_outs[1]), flat(k3_outs[2])),
        Vec3(flat(k3_outs[3]), flat(k3_outs[4]), flat(k3_outs[5])),
        Vec3(flat(k3_outs[6]), flat(k3_outs[7]), flat(k3_outs[8])),
        Vec3(flat(k3_outs[9]), flat(k3_outs[10]), flat(k3_outs[11])),
        flat(k3_outs[12]) != 0,
        pix,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_pipeline(origins, dirs, alive, scene, interpret=False):
    """TPU-safe intersect_scene for mesh scenes: K1+K2+merge-only K3,
    returning the same Intersections contract as ops.sweep
    (t, normal, material_id, outside, tex_u/tex_v/has_uv with real
    per-corner mesh UVs, INSTRUCTION.md:114-116).

    This is what lets file-textured / bump / SSS / env-map / sorted /
    NEE-shadow mesh renders keep their XLA shading while the mesh sweep
    runs in Pallas — the full-pool XLA mesh path (per-lane gathers)
    crashes the TPU worker at large pools and is what the guard
    refuses. Pads the pool internally to the pipeline tile size."""
    from .intersect import Intersections

    P0 = origins.x.shape[0]
    pad = (-P0) % TILE_LANES
    if pad:
        zf = lambda v: jnp.concatenate([v, jnp.zeros((pad,), v.dtype)])
        vpad = lambda v: Vec3(zf(v.x), zf(v.y), zf(v.z))
        origins = vpad(origins)
        # pad dirs with a unit vector so candidacy math stays finite
        dirs = Vec3(
            zf(dirs.x),
            zf(dirs.y),
            jnp.concatenate([dirs.z, jnp.ones((pad,), jnp.float32)]),
        )
        alive = jnp.concatenate([alive, jnp.zeros((pad,), bool)])
    P = origins.x.shape[0]

    want_uv = any(
        scene.mesh_has_uv[i] for i in _mesh_geoms(scene)
    )
    ph = _intersect_phase(
        origins, dirs, alive, scene, interpret, want_uv=want_uv
    )
    at, anx, any_, anz, aout, amat = ph["analytic"]
    dense = ph["dense"]
    xf, inv, invt, gmat, mat, supers, env = ph["tables"]
    mesh_meta = ph["mesh_meta"]
    rows, n_tiles = ph["rows"], ph["n_tiles"]
    smem, vfull, tile, anyspace = _specs_helpers(n_tiles)
    r2 = lambda a: a.reshape(rows, LANE)
    n_res = 9 if want_uv else 6

    def k3i(goff_ref, cnt_ref, inv_ref, super_ref,
            *rest):
        dense_ins = rest[:n_res]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, alive_ref,
         at_ref, anx_ref, any_ref, anz_ref, aout_ref, amat_ref) = (
            rest[n_res:n_res + 13]
        )
        outs = rest[n_res + 13:n_res + 13 + n_res]
        win_refs = rest[n_res + 13 + n_res:n_res + 13 + 2 * n_res]
        merge_refs = rest[n_res + 13 + 2 * n_res:n_res + 13 + 3 * n_res]
        sem = rest[-1]
        k = pl.program_id(0)
        av = alive_ref[:] != 0
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        at = at_ref[:]
        merge_refs[0][:] = at
        merge_refs[1][:] = anx_ref[:]
        merge_refs[2][:] = any_ref[:]
        merge_refs[3][:] = anz_ref[:]
        merge_refs[4][:] = aout_ref[:]
        merge_refs[5][:] = amat_ref[:].astype(jnp.float32)
        if want_uv:
            zero = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
            merge_refs[6][:] = zero
            merge_refs[7][:] = zero
            merge_refs[8][:] = zero
        _routeback_and_merge(
            scene, mesh_meta, inv_ref, super_ref,
            goff_ref, cnt_ref, k,
            ox, oy, oz, dx, dy, dz, av,
            (at,), dense_ins, win_refs, merge_refs, sem,
        )
        for o_ref, m_ref in zip(outs, merge_refs):
            o_ref[:] = m_ref[:]

    shape2d = ph["shape2d"]
    k3_outs = pl.pallas_call(
        k3i,
        grid=(n_tiles,),
        in_specs=[
            smem((n_tiles,)), smem((n_tiles,)),
            smem(tuple(inv.shape)), vfull(tuple(supers.shape)),
        ] + [anyspace] * n_res + [tile] * 13,
        out_specs=[tile] * n_res,
        out_shape=[shape2d] * n_res,
        scratch_shapes=[pltpu.VMEM((WIN_ROWS, LANE), jnp.float32)] * n_res
        + [pltpu.VMEM((TILE_ROWS, LANE), jnp.float32)] * n_res
        + [pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(
        ph["goff"], ph["counts"], inv, supers,
        *dense,
        r2(origins.x), r2(origins.y), r2(origins.z),
        r2(dirs.x), r2(dirs.y), r2(dirs.z),
        r2(alive.astype(jnp.int32)),
        at, anx, any_, anz, aout, amat,
    )

    flat = lambda a: a.reshape(P)[:P0]
    t = flat(k3_outs[0])
    normal = Vec3(flat(k3_outs[1]), flat(k3_outs[2]), flat(k3_outs[3]))
    outside = flat(k3_outs[4]) > 0.5
    mat_id = flat(k3_outs[5]).astype(jnp.int32)
    if want_uv:
        tex_u = flat(k3_outs[6])
        tex_v = flat(k3_outs[7])
        has_uv = flat(k3_outs[8]) > 0.5
    else:
        tex_u = jnp.zeros((P0,), jnp.float32)
        tex_v = jnp.zeros((P0,), jnp.float32)
        has_uv = jnp.zeros((P0,), bool)
    return Intersections(
        t=t, normal=normal, material_id=mat_id, outside=outside,
        tex_u=tex_u, tex_v=tex_v, has_uv=has_uv,
    )
