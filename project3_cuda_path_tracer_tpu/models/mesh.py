"""Wavefront OBJ triangle-mesh loading (INSTRUCTION.md:123-132).

The reference delegates to tinyObj in C++; here a small, dependency-free
parser producing the TriangleSoup SoA consumed by the intersection
kernels. Supports v/vn/f records with v, v//vn, v/vt/vn face syntax and
fan-triangulation of polygons. Negative indices are OBJ-standard
relative indices.
"""

from __future__ import annotations

import numpy as np

from .scene import TriangleSoup


def load_obj(path: str) -> TriangleSoup:
    verts: list = []
    normals: list = []
    faces: list = []  # list of lists of (vi, ni) pairs

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
            elif tag == "f":
                corners = []
                for spec in parts[1:]:
                    fields = spec.split("/")
                    vi = int(fields[0])
                    ni = 0
                    if len(fields) >= 3 and fields[2]:
                        ni = int(fields[2])
                    corners.append((vi, ni))
                # fan triangulation for quads/ngons
                for k in range(1, len(corners) - 1):
                    faces.append([corners[0], corners[k], corners[k + 1]])

    v = np.asarray(verts, dtype=np.float32)
    vn = np.asarray(normals, dtype=np.float32) if normals else None
    t = len(faces)
    v0 = np.zeros((t, 3), np.float32)
    v1 = np.zeros((t, 3), np.float32)
    v2 = np.zeros((t, 3), np.float32)
    n0 = np.zeros((t, 3), np.float32)
    n1 = np.zeros((t, 3), np.float32)
    n2 = np.zeros((t, 3), np.float32)

    def _vidx(i: int, n: int) -> int:
        return i - 1 if i > 0 else n + i

    for ti, face in enumerate(faces):
        pos = [v[_vidx(vi, len(v))] for vi, _ in face]
        v0[ti], v1[ti], v2[ti] = pos
        has_normals = vn is not None and all(ni != 0 for _, ni in face)
        if has_normals:
            nrm = [vn[_vidx(ni, len(vn))] for _, ni in face]
            n0[ti], n1[ti], n2[ti] = nrm
        else:
            fn = np.cross(pos[1] - pos[0], pos[2] - pos[0])
            norm = np.linalg.norm(fn)
            fn = fn / norm if norm > 0 else np.array([0, 1, 0], np.float32)
            n0[ti] = n1[ti] = n2[ti] = fn

    return TriangleSoup(v0=v0, v1=v1, v2=v2, n0=n0, n1=n1, n2=n2)


def mesh_bounds(tris: TriangleSoup):
    """Object-space AABB over all triangles (bounding-volume culling,
    INSTRUCTION.md:128-131)."""
    if tris.count == 0:
        return np.zeros(3, np.float32), np.zeros(3, np.float32)
    allv = np.concatenate([tris.v0, tris.v1, tris.v2], axis=0)
    return allv.min(axis=0), allv.max(axis=0)
