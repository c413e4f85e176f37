"""Wavefront OBJ triangle-mesh loading (INSTRUCTION.md:123-132).

The reference delegates to tinyObj in C++; here a small, dependency-free
parser producing the TriangleSoup SoA consumed by the intersection
kernels. Supports v/vt/vn/f records with v, v//vn, v/vt, v/vt/vn face
syntax and fan-triangulation of polygons. Negative indices are
OBJ-standard relative indices. Texture coordinates (vt) are carried
through per corner for arbitrary-mesh texture mapping
(INSTRUCTION.md:114-116); meshes without vt get has_uv=False and fall
back to box-projected UVs (ops/texture.py).
"""

from __future__ import annotations

import numpy as np

from .scene import TriangleSoup


def load_obj(path: str, prefer_native: bool = True) -> TriangleSoup:
    """Load an OBJ into a TriangleSoup. Uses the native C++ parser
    (csrc/obj_loader.cpp, ~100x faster on large meshes) when available,
    else the pure-Python path below. Both produce identical soups
    (tests/test_uv.py::TestNativeLoader)."""
    if prefer_native:
        soup = _load_obj_native(path)
        if soup is not None:
            return soup
    return _load_obj_python(path)


def _load_obj_native(path: str):
    from ..utils.native import load_obj_loader

    lib = load_obj_loader()
    if lib is None:
        return None
    import ctypes

    cpath = path.encode()
    t = int(lib.obj_count_tris(cpath))
    if t < 0:
        return None
    f3 = [np.zeros((t, 3), np.float32) for _ in range(6)]
    f2 = [np.zeros((t, 2), np.float32) for _ in range(3)]
    has_uv = np.zeros((1,), np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    got = int(
        lib.obj_load(
            cpath,
            ctypes.c_int32(t),
            *[a.ctypes.data_as(fp) for a in f3],
            *[a.ctypes.data_as(fp) for a in f2],
            has_uv.ctypes.data_as(ip),
        )
    )
    if got < 0:
        return None
    return TriangleSoup(
        v0=f3[0][:got], v1=f3[1][:got], v2=f3[2][:got],
        n0=f3[3][:got], n1=f3[4][:got], n2=f3[5][:got],
        uv0=f2[0][:got], uv1=f2[1][:got], uv2=f2[2][:got],
        has_uv=bool(has_uv[0]),
    )


def _load_obj_python(path: str) -> TriangleSoup:
    verts: list = []
    normals: list = []
    texcoords: list = []
    faces: list = []  # list of lists of (vi, ti, ni) triples

    with open(path, "r") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif tag == "vn":
                normals.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                # OBJ vt may carry 1-3 floats; keep (u, v)
                u = float(parts[1])
                v = float(parts[2]) if len(parts) > 2 else 0.0
                texcoords.append([u, v])
            elif tag == "f":
                corners = []
                for spec in parts[1:]:
                    fields = spec.split("/")
                    vi = int(fields[0])
                    ti = 0
                    ni = 0
                    if len(fields) >= 2 and fields[1]:
                        ti = int(fields[1])
                    if len(fields) >= 3 and fields[2]:
                        ni = int(fields[2])
                    corners.append((vi, ti, ni))
                # fan triangulation for quads/ngons
                for k in range(1, len(corners) - 1):
                    faces.append([corners[0], corners[k], corners[k + 1]])

    v = np.asarray(verts, dtype=np.float32)
    vn = np.asarray(normals, dtype=np.float32) if normals else None
    vt = np.asarray(texcoords, dtype=np.float32) if texcoords else None
    t = len(faces)
    v0 = np.zeros((t, 3), np.float32)
    v1 = np.zeros((t, 3), np.float32)
    v2 = np.zeros((t, 3), np.float32)
    n0 = np.zeros((t, 3), np.float32)
    n1 = np.zeros((t, 3), np.float32)
    n2 = np.zeros((t, 3), np.float32)
    uv0 = np.zeros((t, 2), np.float32)
    uv1 = np.zeros((t, 2), np.float32)
    uv2 = np.zeros((t, 2), np.float32)
    all_uv = vt is not None and t > 0

    def _vidx(i: int, n: int) -> int:
        return i - 1 if i > 0 else n + i

    for ti_, face in enumerate(faces):
        pos = [v[_vidx(vi, len(v))] for vi, _, _ in face]
        v0[ti_], v1[ti_], v2[ti_] = pos
        has_normals = vn is not None and all(ni != 0 for _, _, ni in face)
        if has_normals:
            nrm = [vn[_vidx(ni, len(vn))] for _, _, ni in face]
            n0[ti_], n1[ti_], n2[ti_] = nrm
        else:
            fn = np.cross(pos[1] - pos[0], pos[2] - pos[0])
            norm = np.linalg.norm(fn)
            fn = fn / norm if norm > 0 else np.array([0, 1, 0], np.float32)
            n0[ti_] = n1[ti_] = n2[ti_] = fn
        if vt is not None and all(tc != 0 for _, tc, _ in face):
            tcs = [vt[_vidx(tc, len(vt))] for _, tc, _ in face]
            uv0[ti_], uv1[ti_], uv2[ti_] = tcs
        else:
            # has_uv is consumed per-GEOM (every triangle of a has_uv
            # mesh samples by UV), so a single vt-less face must demote
            # the whole mesh to the box-projection fallback rather than
            # silently sampling texel (0,0) (round-2 advisor finding).
            all_uv = False

    return TriangleSoup(
        v0=v0, v1=v1, v2=v2, n0=n0, n1=n1, n2=n2,
        uv0=uv0, uv1=uv1, uv2=uv2, has_uv=all_uv,
    )


def mesh_bounds(tris: TriangleSoup):
    """Object-space AABB over all triangles (bounding-volume culling,
    INSTRUCTION.md:128-131)."""
    if tris.count == 0:
        return np.zeros(3, np.float32), np.zeros(3, np.float32)
    allv = np.concatenate([tris.v0, tris.v1, tris.v2], axis=0)
    return allv.min(axis=0), allv.max(axis=0)
