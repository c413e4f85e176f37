"""Device-resident scene representation (jnp pytrees).

Replaces pathtraceInit's cudaMalloc/cudaMemcpy staging of Geom/Material
AoS arrays (/root/reference/src/pathtrace.cu:79-101) with one
`jax.device_put` of SoA pytrees. Geometry *types* and triangle ranges are
static metadata (they select which intersection code is traced — the
TPU analog of the CUDA kernel's per-geom type branch at
src/pathtrace.cu:180-187), while transforms/materials are traced arrays
so e.g. animated transforms don't recompile.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.vec import Vec3
from .scene import Camera, GeomType, Scene


@dataclass
class DeviceScene:
    # --- traced geometry ---
    transform: jnp.ndarray  # (G,4,4)
    inverse_transform: jnp.ndarray  # (G,4,4)
    inv_transpose: jnp.ndarray  # (G,4,4)
    geom_material_id: jnp.ndarray  # (G,) int32
    geom_velocity: jnp.ndarray  # (G,3) world translation / shutter time
    # --- traced materials (M rows; colors as Vec3 of (M,) columns) ---
    mat_color: "Vec3"
    mat_specular_exponent: jnp.ndarray  # (M,)
    mat_specular_color: "Vec3"
    mat_has_reflective: jnp.ndarray  # (M,)
    mat_has_refractive: jnp.ndarray  # (M,)
    mat_ior: jnp.ndarray  # (M,)
    mat_emittance: jnp.ndarray  # (M,)
    mat_sss: jnp.ndarray  # (M,) subsurface extinction sigma
    # texture/bump columns + flattened dense atlases (ops/texture.py)
    mat_tex_kind: jnp.ndarray  # (M,) int32: 0 none, 1 checker, 2 file
    mat_tex_id: jnp.ndarray  # (M,) int32
    mat_tex_scale: jnp.ndarray  # (M,)
    mat_bump_id: jnp.ndarray  # (M,) int32, -1 none
    mat_bump_scale: jnp.ndarray  # (M,)
    tex_r: jnp.ndarray  # (N*R*R,)
    tex_g: jnp.ndarray
    tex_b: jnp.ndarray
    bump_h: jnp.ndarray  # (Nb*R*R,)
    # environment light: constant sky color (3,) + flattened lat-long
    # radiance map channels (H*W,) each (empty when absent)
    env_color: jnp.ndarray  # (3,)
    env_r: jnp.ndarray
    env_g: jnp.ndarray
    env_b: jnp.ndarray
    # --- traced triangle soup (object space, all meshes concatenated),
    # stored as Vec3 of dense (T,) columns (ops/vec.py layout rule) ---
    tri_v0: "Vec3"
    tri_v1: "Vec3"
    tri_v2: "Vec3"
    tri_n0: "Vec3"
    tri_n1: "Vec3"
    tri_n2: "Vec3"
    # per-corner texture coordinates as dense (T,) columns (u,v per
    # corner); zeros when the geom's OBJ had no vt (see mesh_has_uv)
    tri_uv0u: jnp.ndarray
    tri_uv0v: jnp.ndarray
    tri_uv1u: jnp.ndarray
    tri_uv1v: jnp.ndarray
    tri_uv2u: jnp.ndarray
    tri_uv2v: jnp.ndarray
    # --- Pallas mesh tables: triangles packed FOUR per row as
    # (T/4, 96) f32 [tri0: v0,v1,v2,n0,n1,n2,uv0,uv1,uv2 | tri1 | ...].
    # VMEM pads the minor dim to 128 lanes, so a naive (T,24) layout
    # wastes 5.3x (24->128) — 26 MB at 51k tris, which overflows the
    # ~16 MB VMEM and crashes the TPU worker; 96/128 is 75% dense.
    # Chunk AABBs are (C,8) rows [min_xyz, max_xyz, 2 pad] over CHUNK
    # consecutive (BVH-reordered, spatially coherent) triangles. Read
    # row-wise by scalar index inside kernels — the gather-free TPU
    # mesh path (ops/megakernel.py). Each mesh geom's rows start
    # CHUNK-aligned (see mesh_table_ranges).
    mesh_tri_table: jnp.ndarray  # (T_pad/4, 96) f32
    mesh_chunk_aabbs: jnp.ndarray  # (C,8) f32
    # level-2 culling: AABBs over SUPER consecutive chunks (SUPER*CHUNK
    # = 1024 BVH-ordered triangles per row) — the in-kernel hierarchy's
    # coarse level (ops/megakernel.py::_mesh_test)
    mesh_super_aabbs: jnp.ndarray  # (S,8) f32
    # per-SUPERNODE transposed attribute slabs for the deferred-fetch
    # window sweep (ops/pipeline.py, PT_TPU_SWEEP_DEFER): slab s row
    # p*60 + q*15 + j, col r = bf16 part p of the exact 3-way split
    # (_split3_bf16 semantics) of triangle attribute j (cols 9-23 of
    # the packed table: n0 n1 n2 xyz, then per-corner u0 v0 u1 v1 u2
    # v2) for the triangle at position q of the super's table row r.
    # The sweep carries the winner's (row, pos) and fetches its 15
    # attrs post-sweep with ONE (192, sup_rows)@(sup_rows, 128) bf16
    # one-hot matmul per 128-lane row — exact f32 reconstruction,
    # same argument as the envmap atlas (ops/megakernel._env_fetch).
    mesh_attr_slabs: jnp.ndarray  # (S_pad, 192, sup_rows) bf16
    # --- BVH flat arrays (built on host; empty when unused). Preorder
    # threaded layout with escape pointers (models/bvh.py); all columns
    # dense rank-1 ---
    bvh_min: "Vec3"  # (B,) lanes: node AABB min
    bvh_max: "Vec3"  # (B,) lanes: node AABB max
    bvh_first: jnp.ndarray  # (B,) int32: leaf first triangle (global)
    bvh_count: jnp.ndarray  # (B,) int32: leaf triangle count
    bvh_skip: jnp.ndarray  # (B,) int32: escape pointer (preorder)
    bvh_leaf: jnp.ndarray  # (B,) bool
    # --- static metadata ---
    gtypes: Tuple[int, ...]
    tri_ranges: Tuple[Tuple[int, int], ...]  # per-geom (start, count)
    bvh_roots: Tuple[Tuple[int, int], ...]  # per-geom (node_start, node_count)
    # material-class flags: let the shader specialize its RNG draw count
    # and skip whole branches for scenes that can't take them
    any_refractive: bool
    any_partial_reflective: bool  # any 0 < REFL < 1 (probabilistic mix)
    # geoms whose material is emissive (direct-lighting targets)
    emissive_geoms: Tuple[int, ...]
    # per-geom (chunk_start, chunk_count) into mesh_chunk_aabbs
    chunk_ranges: Tuple[Tuple[int, int], ...]
    # per-geom (super_start, super_count) into mesh_super_aabbs
    super_ranges: Tuple[Tuple[int, int], ...]
    # per-geom (table_tri_start, tri_count): CHUNK-aligned start of the
    # geom's triangles inside mesh_tri_table (row = start/4); tri_ranges
    # keeps the unpadded soup offsets for the XLA paths
    mesh_table_ranges: Tuple[Tuple[int, int], ...]
    # per-geom: mesh carries real per-corner UVs (OBJ vt records)
    mesh_has_uv: Tuple[bool, ...]
    # per-geom OBJECT-space mesh AABB (mnx,mny,mnz,mxx,mxy,mxz); static
    # floats (object space never moves — motion blur advances the
    # transform) so kernels fold them as broadcast constants for the
    # per-lane candidacy test that feeds in-tile compaction
    # (ops/compaction.py). Zeros for non-mesh geoms.
    mesh_obj_aabbs: Tuple[Tuple[float, ...], ...]
    any_textured: bool
    any_bump: bool
    n_file_textures: int
    n_bump_textures: int
    any_glossy: bool  # any SPECEX > 0 (Phong imperfect specular)
    any_sss: bool  # any SSS > 0 (subsurface scattering)
    has_env_const: bool  # nonzero constant ENVLIGHT color
    has_env_map: bool  # lat-long ENVMAP present (XLA path only)


jax.tree_util.register_dataclass(
    DeviceScene,
    data_fields=[
        "transform",
        "inverse_transform",
        "inv_transpose",
        "geom_material_id",
        "geom_velocity",
        "mat_color",
        "mat_specular_exponent",
        "mat_specular_color",
        "mat_has_reflective",
        "mat_has_refractive",
        "mat_ior",
        "mat_emittance",
        "mat_sss",
        "mat_tex_kind",
        "mat_tex_id",
        "mat_tex_scale",
        "mat_bump_id",
        "mat_bump_scale",
        "tex_r",
        "tex_g",
        "tex_b",
        "bump_h",
        "env_color",
        "env_r",
        "env_g",
        "env_b",
        "tri_v0",
        "tri_v1",
        "tri_v2",
        "tri_n0",
        "tri_n1",
        "tri_n2",
        "tri_uv0u",
        "tri_uv0v",
        "tri_uv1u",
        "tri_uv1v",
        "tri_uv2u",
        "tri_uv2v",
        "mesh_tri_table",
        "mesh_chunk_aabbs",
        "mesh_super_aabbs",
        "mesh_attr_slabs",
        "bvh_min",
        "bvh_max",
        "bvh_first",
        "bvh_count",
        "bvh_skip",
        "bvh_leaf",
    ],
    meta_fields=[
        "gtypes",
        "tri_ranges",
        "bvh_roots",
        "any_refractive",
        "any_partial_reflective",
        "emissive_geoms",
        "chunk_ranges",
        "super_ranges",
        "mesh_table_ranges",
        "mesh_has_uv",
        "mesh_obj_aabbs",
        "any_textured",
        "any_bump",
        "n_file_textures",
        "n_bump_textures",
        "any_glossy",
        "any_sss",
        "has_env_const",
        "has_env_map",
    ],
)


@dataclass
class DeviceCamera:
    """Traced camera parameters: orbit/zoom/pan only re-upload 5 small
    vectors instead of recompiling (reset-on-camera-change contract,
    src/main.cpp:102-120). Resolution is static (shapes depend on it)."""

    position: jnp.ndarray  # (3,)
    view: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    right: jnp.ndarray  # (3,)
    pixel_length: jnp.ndarray  # (2,)
    aperture: jnp.ndarray  # () thin-lens radius, 0 = pinhole
    focal_distance: jnp.ndarray  # ()
    resolution: Tuple[int, int]


jax.tree_util.register_dataclass(
    DeviceCamera,
    data_fields=[
        "position",
        "view",
        "up",
        "right",
        "pixel_length",
        "aperture",
        "focal_distance",
    ],
    meta_fields=["resolution"],
)


def camera_to_device(cam: Camera) -> DeviceCamera:
    focal = cam.focal_distance
    if focal <= 0.0:
        focal = float(np.linalg.norm(cam.look_at - cam.position))
    return DeviceCamera(
        position=jnp.asarray(cam.position, jnp.float32),
        view=jnp.asarray(cam.view, jnp.float32),
        up=jnp.asarray(cam.up, jnp.float32),
        right=jnp.asarray(cam.right, jnp.float32),
        pixel_length=jnp.asarray(cam.pixel_length, jnp.float32),
        aperture=jnp.asarray(cam.aperture, jnp.float32),
        focal_distance=jnp.asarray(focal, jnp.float32),
        resolution=(int(cam.resolution[0]), int(cam.resolution[1])),
    )


def advance_time(scene: DeviceScene, t: jnp.ndarray) -> DeviceScene:
    """Translate each geom by velocity*t (motion blur,
    INSTRUCTION.md:119-120). Pure function of traced arrays — no
    recompilation per time sample. For M' = T(v t) @ M:
      transform'[:3,3]        += v t
      inverse'[:3,3]          -= inverse[:3,:3] @ (v t)
      invTranspose 3x3 part    unchanged (translations don't touch it).
    """
    import dataclasses

    vt = scene.geom_velocity * t  # (G,3)
    xf = scene.transform.at[:, :3, 3].add(vt)
    lin = scene.inverse_transform[:, :3, :3]  # (G,3,3)
    # elementwise mul+reduce (NOT einsum: the MXU's f32 path would
    # truncate these coordinates to bf16)
    delta = (lin * vt[:, None, :]).sum(axis=-1)
    inv = scene.inverse_transform.at[:, :3, 3].add(-delta)
    return dataclasses.replace(
        scene, transform=xf, inverse_transform=inv
    )


def scene_to_device(scene: Scene, use_bvh: bool = True) -> DeviceScene:
    g = scene.geoms
    m = scene.materials
    t = scene.triangles

    bvh_roots: list = []
    if use_bvh and t.count > 0:
        from .bvh import build_scene_bvh

        nodes_min, nodes_max, meta, bvh_roots = build_scene_bvh(scene)
        t = scene.triangles  # build_scene_bvh reorders the soup in place
    else:
        nodes_min = np.zeros((0, 3), np.float32)
        nodes_max = np.zeros((0, 3), np.float32)
        meta = np.zeros((0, 4), np.int32)
        bvh_roots = [(0, 0)] * g.count

    dev = jnp.asarray  # alias

    def vec_cols(a: np.ndarray) -> Vec3:
        return Vec3(dev(a[:, 0]), dev(a[:, 1]), dev(a[:, 2]))

    # Pallas mesh tables (gather-free kernel path): triangles in the
    # BVH-reordered (spatially sorted) order -> tight chunk AABBs.
    # Sizes are shared with the kernels (ops/megakernel.py knobs).
    from ..ops.megakernel import MESH_CHUNK as CHUNK, MESH_SUPER, TRI_ROW

    # Per-geom CHUNK-aligned placement into the packed table (a later
    # mesh's soup offset is not chunk-aligned; the table re-bases each).
    table_ranges = []
    table_total = 0
    for gi in range(g.count):
        c = int(g.tri_count[gi])
        if g.gtype[gi] != int(GeomType.MESH) or c == 0:
            table_ranges.append((0, 0))
            continue
        table_ranges.append((table_total, c))
        table_total += -(-c // CHUNK) * CHUNK
    T_pad = max(table_total, CHUNK)
    flat = np.zeros((T_pad, 24), np.float32)
    for gi in range(g.count):
        ts, c = table_ranges[gi]
        if c == 0:
            continue
        s = int(g.tri_start[gi])
        # cols 3:9 hold the EDGES e1 = v1 - v0, e2 = v2 - v0 (not the
        # corners): the f32 subtraction here is the identical IEEE op
        # _mt_chunk used to do in-kernel, so results are bit-exact and
        # every Moller test saves 6 VPU subs (the sweep runs ~65 ops x
        # 1024 tris per 8-row block — docs/ANALYSIS.md).
        flat[ts : ts + c, 0:3] = t.v0[s : s + c]
        flat[ts : ts + c, 3:6] = t.v1[s : s + c] - t.v0[s : s + c]
        flat[ts : ts + c, 6:9] = t.v2[s : s + c] - t.v0[s : s + c]
        flat[ts : ts + c, 9:12] = t.n0[s : s + c]
        flat[ts : ts + c, 12:15] = t.n1[s : s + c]
        flat[ts : ts + c, 15:18] = t.n2[s : s + c]
        flat[ts : ts + c, 18:20] = t.uv0[s : s + c]
        flat[ts : ts + c, 20:22] = t.uv1[s : s + c]
        flat[ts : ts + c, 22:24] = t.uv2[s : s + c]
    # 4 triangles per 96-lane row: dense in the 128-lane VMEM tiling
    tri_table = flat.reshape(T_pad // TRI_ROW, 24 * TRI_ROW)
    SUPER = MESH_SUPER  # chunks per level-2 supernode
    chunk_aabbs_list = []
    super_aabbs_list = []
    chunk_ranges = []
    super_ranges = []
    obj_aabbs = []
    chunk_base = 0
    super_base = 0
    for gi in range(g.count):
        s, c = int(g.tri_start[gi]), int(g.tri_count[gi])
        if g.gtype[gi] != int(GeomType.MESH) or c == 0:
            chunk_ranges.append((0, 0))
            super_ranges.append((0, 0))
            obj_aabbs.append((0.0,) * 6)
            continue
        n_chunks = -(-c // CHUNK)
        geom_chunks = []
        for k in range(n_chunks):
            lo = s + k * CHUNK
            hi = min(s + c, lo + CHUNK)
            allv = np.concatenate([t.v0[lo:hi], t.v1[lo:hi], t.v2[lo:hi]])
            row = np.zeros(8, np.float32)
            row[0:3] = allv.min(axis=0)
            row[3:6] = allv.max(axis=0)
            geom_chunks.append(row)
        grp_all = np.stack(geom_chunks)
        obj_aabbs.append(
            tuple(float(x) for x in grp_all[:, 0:3].min(axis=0))
            + tuple(float(x) for x in grp_all[:, 3:6].max(axis=0))
        )
        chunk_aabbs_list.extend(geom_chunks)
        chunk_ranges.append((chunk_base, n_chunks))
        chunk_base += n_chunks
        n_supers = -(-n_chunks // SUPER)
        for k in range(n_supers):
            grp = np.stack(geom_chunks[k * SUPER : (k + 1) * SUPER])
            row = np.zeros(8, np.float32)
            row[0:3] = grp[:, 0:3].min(axis=0)
            row[3:6] = grp[:, 3:6].max(axis=0)
            super_aabbs_list.append(row)
        super_ranges.append((super_base, n_supers))
        super_base += n_supers
    chunk_aabbs = (
        np.stack(chunk_aabbs_list)
        if chunk_aabbs_list
        else np.zeros((0, 8), np.float32)
    )
    super_aabbs = (
        np.stack(super_aabbs_list)
        if super_aabbs_list
        else np.zeros((0, 8), np.float32)
    )

    # Per-supernode transposed attribute slabs (deferred-fetch window
    # sweep — see the mesh_attr_slabs field comment). Built from the
    # same `flat` the packed table reshapes, so values are the exact
    # f32s _mt_chunk's inline interpolation reads; the 3-way bf16
    # split mirrors ops/megakernel._split3_bf16 bit-for-bit.
    rpc_rows = CHUNK // TRI_ROW
    sup_rows = SUPER * rpc_rows
    n_sup_total = super_base
    attr_slabs = np.zeros(
        (max(n_sup_total, 1), 192, sup_rows), np.float32
    )
    if n_sup_total:
        tri3 = flat.reshape(T_pad // TRI_ROW, TRI_ROW, 24)
        attrs = tri3[:, :, 9:24]  # (R, 4, 15) f32
        trunc16 = lambda a: (
            a.view(np.uint32) & np.uint32(0xFFFF0000)
        ).view(np.float32)
        hi = trunc16(attrs)
        rem = attrs - hi
        mid = trunc16(rem)
        lo = rem - mid
        parts = np.stack([hi, mid, lo])  # (3, R, 4, 15)
        R_total = T_pad // TRI_ROW
        for gi in range(g.count):
            ts_, c = table_ranges[gi]
            if c == 0:
                continue
            sbase, n_sup = super_ranges[gi]
            rows0 = ts_ // TRI_ROW
            rows_geom = -(-c // CHUNK) * rpc_rows
            for k in range(n_sup):
                r0 = rows0 + k * sup_rows
                nr = min(rows0 + rows_geom, r0 + sup_rows, R_total) - r0
                if nr <= 0:
                    continue
                blk = parts[:, r0:r0 + nr]  # (3, nr, 4, 15)
                attr_slabs[sbase + k, :180, :nr] = (
                    blk.transpose(0, 2, 3, 1).reshape(180, nr)
                )

    return DeviceScene(
        transform=dev(g.transform),
        inverse_transform=dev(g.inverse_transform),
        inv_transpose=dev(g.inv_transpose),
        geom_material_id=dev(g.material_id),
        geom_velocity=dev(g.velocity),
        mat_color=vec_cols(m.color),
        mat_specular_exponent=dev(m.specular_exponent),
        mat_specular_color=vec_cols(m.specular_color),
        mat_has_reflective=dev(m.has_reflective),
        mat_has_refractive=dev(m.has_refractive),
        mat_ior=dev(m.index_of_refraction),
        mat_emittance=dev(m.emittance),
        mat_sss=dev(m.subsurface),
        mat_tex_kind=dev(m.tex_kind),
        mat_tex_id=dev(m.tex_id),
        mat_tex_scale=dev(m.tex_scale),
        mat_bump_id=dev(m.bump_id),
        mat_bump_scale=dev(m.bump_scale),
        tex_r=dev(scene.textures[..., 0].reshape(-1)),
        tex_g=dev(scene.textures[..., 1].reshape(-1)),
        tex_b=dev(scene.textures[..., 2].reshape(-1)),
        bump_h=dev(scene.bumps.reshape(-1)),
        env_color=dev(scene.env_color),
        env_r=dev(scene.env_map[..., 0].reshape(-1)),
        env_g=dev(scene.env_map[..., 1].reshape(-1)),
        env_b=dev(scene.env_map[..., 2].reshape(-1)),
        mesh_tri_table=dev(tri_table),
        mesh_chunk_aabbs=dev(chunk_aabbs),
        mesh_super_aabbs=dev(super_aabbs),
        mesh_attr_slabs=dev(attr_slabs).astype(jnp.bfloat16),
        tri_v0=vec_cols(t.v0),
        tri_v1=vec_cols(t.v1),
        tri_v2=vec_cols(t.v2),
        tri_n0=vec_cols(t.n0),
        tri_n1=vec_cols(t.n1),
        tri_n2=vec_cols(t.n2),
        tri_uv0u=dev(t.uv0[:, 0]),
        tri_uv0v=dev(t.uv0[:, 1]),
        tri_uv1u=dev(t.uv1[:, 0]),
        tri_uv1v=dev(t.uv1[:, 1]),
        tri_uv2u=dev(t.uv2[:, 0]),
        tri_uv2v=dev(t.uv2[:, 1]),
        bvh_min=vec_cols(nodes_min) if nodes_min.shape[0] else Vec3(
            dev(np.zeros(0, np.float32)),
            dev(np.zeros(0, np.float32)),
            dev(np.zeros(0, np.float32)),
        ),
        bvh_max=vec_cols(nodes_max) if nodes_max.shape[0] else Vec3(
            dev(np.zeros(0, np.float32)),
            dev(np.zeros(0, np.float32)),
            dev(np.zeros(0, np.float32)),
        ),
        bvh_first=dev(meta[:, 0].copy()),
        bvh_count=dev(meta[:, 1].copy()),
        bvh_skip=dev(meta[:, 2].copy()),
        bvh_leaf=dev(meta[:, 3].copy().astype(bool)),
        gtypes=tuple(int(x) for x in g.gtype),
        tri_ranges=tuple(
            (int(s), int(c)) for s, c in zip(g.tri_start, g.tri_count)
        ),
        bvh_roots=tuple(bvh_roots),
        any_refractive=bool((m.has_refractive > 0).any()),
        any_partial_reflective=bool(
            ((m.has_reflective > 0) & (m.has_reflective < 1)).any()
        ),
        emissive_geoms=tuple(
            int(i)
            for i in range(g.count)
            if m.emittance[g.material_id[i]] > 0
        ),
        chunk_ranges=tuple(chunk_ranges),
        super_ranges=tuple(super_ranges),
        mesh_table_ranges=tuple(table_ranges),
        mesh_has_uv=tuple(bool(x) for x in g.has_uv),
        mesh_obj_aabbs=tuple(obj_aabbs),
        any_textured=bool((m.tex_kind > 0).any()),
        any_bump=bool((m.bump_id >= 0).any()),
        n_file_textures=int(scene.textures.shape[0]),
        n_bump_textures=int(scene.bumps.shape[0]),
        any_glossy=bool((m.specular_exponent > 0).any()),
        any_sss=bool((m.subsurface > 0).any()),
        has_env_const=bool((scene.env_color != 0).any()),
        has_env_map=bool(scene.env_map.size > 0),
    )
