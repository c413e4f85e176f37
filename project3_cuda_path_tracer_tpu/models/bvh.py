"""BVH construction (host side) -> flat int32/float32 arrays for TPU.

The reference's spec asks for hierarchical spatial structures with
CPU-side construction and iterative GPU traversal
(/root/reference/INSTRUCTION.md:133-140,218-240). We build a binned-SAH
BVH over each mesh's object-space triangles and flatten it in DFS
preorder with ESCAPE ("skip") pointers, which is what makes traversal
stackless on the device (ops/bvh_traverse.py): at node i,
  hit AABB  -> descend to i+1 (preorder: left child is adjacent)
  miss      -> jump to skip[i] (next subtree in preorder)
so a per-lane int32 cursor is the entire traversal state — no stack,
exactly the "iterative traversal, tunable depth" contract.

Leaves hold up to LEAF_SIZE triangles, contiguous after a build-time
reorder, so the device tests them with a fixed-size unrolled loop.

Two builders: a C++ native one (csrc/bvh_builder.cpp via ctypes, for
large meshes) and this pure-numpy fallback with identical output
layout. `build_scene_bvh` prefers native and falls back transparently.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

LEAF_SIZE = 4
SAH_BINS = 16


def _build_numpy(
    v0: np.ndarray, v1: np.ndarray, v2: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Binned-SAH recursive build. Returns (nodes_min (B,3),
    nodes_max (B,3), meta (B,4) int32, tri_order (T,) int32).

    meta rows: [first_tri, tri_count, skip, is_leaf] — first_tri/count
    valid for leaves (indices into the REORDERED triangle array);
    skip = preorder index of the next node when this subtree is skipped
    (B = past-the-end sentinel for the rightmost spine).
    """
    T = v0.shape[0]
    centroid = (v0 + v1 + v2) / 3.0
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)

    order = np.arange(T, dtype=np.int32)
    nodes_min: List[np.ndarray] = []
    nodes_max: List[np.ndarray] = []
    meta: List[List[int]] = []

    def emit(lo: int, hi: int) -> int:
        """Build subtree over order[lo:hi]; returns this node's index."""
        idx = len(meta)
        ids = order[lo:hi]
        bb_min = tmin[ids].min(axis=0)
        bb_max = tmax[ids].max(axis=0)
        nodes_min.append(bb_min)
        nodes_max.append(bb_max)
        meta.append([lo, hi - lo, -1, 1])  # provisional leaf

        n = hi - lo
        if n <= LEAF_SIZE:
            return idx

        # Binned SAH over the centroid extent's longest axes; fall back
        # to median split when SAH finds no win.
        c = centroid[ids]
        c_min, c_max = c.min(axis=0), c.max(axis=0)
        extent = c_max - c_min
        axis = int(np.argmax(extent))
        if extent[axis] <= 1e-12:
            mid = lo + n // 2
        else:
            rel = (c[:, axis] - c_min[axis]) / extent[axis]
            bins = np.minimum((rel * SAH_BINS).astype(np.int32), SAH_BINS - 1)
            counts = np.bincount(bins, minlength=SAH_BINS)
            # per-bin bounds for SAH surface areas
            best_cost, best_split = np.inf, None
            bin_min = np.full((SAH_BINS, 3), np.inf)
            bin_max = np.full((SAH_BINS, 3), -np.inf)
            for b in range(SAH_BINS):
                sel = bins == b
                if sel.any():
                    bin_min[b] = tmin[ids[sel]].min(axis=0)
                    bin_max[b] = tmax[ids[sel]].max(axis=0)

            def area(mn, mx):
                d = np.maximum(mx - mn, 0)
                return 2 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

            left_min = np.minimum.accumulate(bin_min, axis=0)
            left_max = np.maximum.accumulate(bin_max, axis=0)
            right_min = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
            right_max = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
            left_cnt = np.cumsum(counts)
            for b in range(SAH_BINS - 1):
                nl, nr = left_cnt[b], n - left_cnt[b]
                if nl == 0 or nr == 0:
                    continue
                cost = nl * area(left_min[b], left_max[b]) + nr * area(
                    right_min[b + 1], right_max[b + 1]
                )
                if cost < best_cost:
                    best_cost, best_split = cost, b
            if best_split is None:
                mid = lo + n // 2
            else:
                sel_left = bins <= best_split
                left_ids = ids[sel_left]
                right_ids = ids[~sel_left]
                order[lo : lo + len(left_ids)] = left_ids
                order[lo + len(left_ids) : hi] = right_ids
                mid = lo + len(left_ids)
        if mid == lo or mid == hi:
            mid = lo + n // 2

        meta[idx][3] = 0  # internal
        emit(lo, mid)  # left child == idx+1 (preorder)
        right = emit(mid, hi)
        meta[idx][0] = right  # stash right-child index (debug/analysis)
        meta[idx][1] = 0
        return idx

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        if T > 0:
            emit(0, T)
    finally:
        sys.setrecursionlimit(old_limit)

    B = len(meta)
    meta_arr = np.asarray(meta, np.int32).reshape(B, 4)
    # skip pointers: next node in preorder at <= depth. Computed with a
    # stack over the implicit tree: node i's subtree ends where its
    # sibling (or ancestor's sibling) begins.
    skip = np.full(B, B, np.int32)
    stack: List[int] = []

    def fill_skip(idx: int, skip_to: int) -> None:
        # iterative DFS mirroring emit()'s preorder
        work = [(idx, skip_to)]
        while work:
            i, s = work.pop()
            skip[i] = s
            if meta_arr[i, 3] == 0:  # internal
                right = meta_arr[i, 0]
                work.append((i + 1, right))  # left child skips to right
                work.append((right, s))  # right child skips out

    if B:
        fill_skip(0, B)
    meta_arr[:, 2] = skip

    return (
        np.asarray(nodes_min, np.float32).reshape(B, 3),
        np.asarray(nodes_max, np.float32).reshape(B, 3),
        meta_arr,
        order,
    )


def _build_native(v0, v1, v2):
    """C++ builder via ctypes (csrc/bvh_builder.cpp). Returns same tuple
    as _build_numpy or None if the shared library is unavailable."""
    from ..utils.native import load_bvh_builder

    lib = load_bvh_builder()
    if lib is None:
        return None
    import ctypes

    T = v0.shape[0]
    verts = np.ascontiguousarray(
        np.stack([v0, v1, v2], axis=1).reshape(T * 3, 3), np.float32
    )
    max_nodes = max(2 * T, 1)
    nodes_min = np.zeros((max_nodes, 3), np.float32)
    nodes_max = np.zeros((max_nodes, 3), np.float32)
    meta = np.zeros((max_nodes, 4), np.int32)
    order = np.zeros((T,), np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    n_nodes = lib.build_bvh(
        verts.ctypes.data_as(fp),
        ctypes.c_int32(T),
        ctypes.c_int32(LEAF_SIZE),
        ctypes.c_int32(SAH_BINS),
        nodes_min.ctypes.data_as(fp),
        nodes_max.ctypes.data_as(fp),
        meta.ctypes.data_as(ip),
        order.ctypes.data_as(ip),
    )
    if n_nodes <= 0:
        return None
    return (
        nodes_min[:n_nodes].copy(),
        nodes_max[:n_nodes].copy(),
        meta[:n_nodes].copy(),
        order,
    )


def build_mesh_bvh(v0, v1, v2, prefer_native: bool = True):
    """Build one mesh's BVH; native C++ if available, numpy otherwise."""
    if prefer_native and v0.shape[0] >= 256:
        out = _build_native(v0, v1, v2)
        if out is not None:
            return out
    return _build_numpy(v0, v1, v2)


def build_scene_bvh(scene):
    """Build BVHs for every mesh geom; returns concatenated flat arrays
    plus per-geom (node_start, node_count) roots, and REORDERS the
    scene's triangle soup in place so leaves reference contiguous runs."""
    from .scene import GeomType

    t = scene.triangles
    all_min, all_max, all_meta = [], [], []
    roots = []
    node_base = 0
    new_order = np.arange(t.count, dtype=np.int64)

    for gi in range(scene.geoms.count):
        if scene.geoms.gtype[gi] != int(GeomType.MESH):
            roots.append((0, 0))
            continue
        s, c = int(scene.geoms.tri_start[gi]), int(scene.geoms.tri_count[gi])
        if c == 0:
            roots.append((0, 0))
            continue
        nm, nx, meta, order = build_mesh_bvh(
            t.v0[s : s + c], t.v1[s : s + c], t.v2[s : s + c]
        )
        new_order[s : s + c] = s + order.astype(np.int64)
        # leaf first_tri is local to the mesh: offset to global soup
        leaf = meta[:, 3] == 1
        meta = meta.copy()
        meta[leaf, 0] += s
        # skip pointers are local node indices: offset to global table
        meta[:, 2] += node_base
        roots.append((node_base, meta.shape[0]))
        all_min.append(nm)
        all_max.append(nx)
        all_meta.append(meta)
        node_base += meta.shape[0]

    # apply triangle reorder so leaves are contiguous
    for name in ("v0", "v1", "v2", "n0", "n1", "n2", "uv0", "uv1", "uv2"):
        arr = getattr(t, name)
        setattr(t, name, np.ascontiguousarray(arr[new_order]))

    if all_min:
        return (
            np.concatenate(all_min),
            np.concatenate(all_max),
            np.concatenate(all_meta),
            roots,
        )
    return (
        np.zeros((0, 3), np.float32),
        np.zeros((0, 3), np.float32),
        np.zeros((0, 4), np.int32),
        roots,
    )
