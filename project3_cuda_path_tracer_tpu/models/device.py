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
    # --- traced materials (M rows; colors as Vec3 of (M,) columns) ---
    mat_color: "Vec3"
    mat_specular_exponent: jnp.ndarray  # (M,)
    mat_specular_color: "Vec3"
    mat_has_reflective: jnp.ndarray  # (M,)
    mat_has_refractive: jnp.ndarray  # (M,)
    mat_ior: jnp.ndarray  # (M,)
    mat_emittance: jnp.ndarray  # (M,)
    # --- traced triangle soup (object space, all meshes concatenated),
    # stored as Vec3 of dense (T,) columns (ops/vec.py layout rule) ---
    tri_v0: "Vec3"
    tri_v1: "Vec3"
    tri_v2: "Vec3"
    tri_n0: "Vec3"
    tri_n1: "Vec3"
    tri_n2: "Vec3"
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


jax.tree_util.register_dataclass(
    DeviceScene,
    data_fields=[
        "transform",
        "inverse_transform",
        "inv_transpose",
        "geom_material_id",
        "mat_color",
        "mat_specular_exponent",
        "mat_specular_color",
        "mat_has_reflective",
        "mat_has_refractive",
        "mat_ior",
        "mat_emittance",
        "tri_v0",
        "tri_v1",
        "tri_v2",
        "tri_n0",
        "tri_n1",
        "tri_n2",
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

    return DeviceScene(
        transform=dev(g.transform),
        inverse_transform=dev(g.inverse_transform),
        inv_transpose=dev(g.inv_transpose),
        geom_material_id=dev(g.material_id),
        mat_color=vec_cols(m.color),
        mat_specular_exponent=dev(m.specular_exponent),
        mat_specular_color=vec_cols(m.specular_color),
        mat_has_reflective=dev(m.has_reflective),
        mat_has_refractive=dev(m.has_refractive),
        mat_ior=dev(m.index_of_refraction),
        mat_emittance=dev(m.emittance),
        tri_v0=vec_cols(t.v0),
        tri_v1=vec_cols(t.v1),
        tri_v2=vec_cols(t.v2),
        tri_n0=vec_cols(t.n0),
        tri_n1=vec_cols(t.n1),
        tri_n2=vec_cols(t.n2),
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
    )
