"""Whole-scene intersection sweep: min-t over all geoms for the path pool.

TPU-native analog of computeIntersections
(/root/reference/src/pathtrace.cu:149-213): the CUDA kernel's per-thread
linear scan over geoms becomes a trace-time-unrolled loop over the
(static) geom list, each step a fused batched primitive test over the
whole pool, with the min-t running best kept fused by XLA. All vectors
are dense (P,) Vec3 lanes (ops/vec.py).

Mesh instances (extension per INSTRUCTION.md:123-140) intersect in
object space: a chunked Möller–Trumbore scan — triangles broadcast as
(8,1) columns against rays as (1,P) rows so every intermediate is an
(8,P) tensor, which tiles the f32 (8,128) VPU registers EXACTLY — or
flat-array BVH traversal (ops/bvh_traverse.py) when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.device import DeviceScene
from ..models.scene import GeomType
from .intersect import (
    FLT_MAX,
    MISS,
    RAY_EPS,
    Intersections,
    box_intersect,
    closer_hit,
    sphere_intersect,
    transform_dir,
    transform_point,
)
from .vec import Vec3, where as vwhere

_TRI_CHUNK = 8  # sublane-exact chunk: (8,P) f32 == one (8,128)-tile column


def _mesh_intersect_naive(
    scene: DeviceScene, geom_index: int, origins: Vec3, dirs: Vec3
):
    """Naive triangle sweep for one mesh instance (BVH/culling OFF path,
    the comparison baseline mandated by INSTRUCTION.md:128-131).

    Returns (dist (P,), normal Vec3, outside (P,), tex_u (P,), tex_v (P,))
    with tex_u/v the barycentric-interpolated OBJ texture coordinates of
    the winning triangle (zeros when the mesh has no vt records)."""
    start, count = scene.tri_ranges[geom_index]
    inv = scene.inverse_transform[geom_index]
    xf = scene.transform[geom_index]
    inv_t = scene.inv_transpose[geom_index]

    ro = transform_point(inv, origins)
    rd = transform_dir(inv, dirs).normalize()
    P = origins.x.shape[0]

    pad = (-count) % _TRI_CHUNK
    n_chunks = (count + pad) // _TRI_CHUNK

    def chunked(col):  # (T,) -> (nC, 8, 1)
        c = jax.lax.slice_in_dim(col, start, start + count)
        if pad:
            c = jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
        return c.reshape(n_chunks, _TRI_CHUNK, 1)

    tv = [
        Vec3(chunked(v.x), chunked(v.y), chunked(v.z))
        for v in (scene.tri_v0, scene.tri_v1, scene.tri_v2)
    ]

    # Rays broadcast as (1,P) rows.
    ro_b = Vec3(ro.x[None, :], ro.y[None, :], ro.z[None, :])
    rd_b = Vec3(rd.x[None, :], rd.y[None, :], rd.z[None, :])

    from .intersect import triangle_intersect

    def body(carry, chunk):
        bt, bidx, bu, bv = carry
        cv0, cv1, cv2, chunk_id = chunk
        # (8,P) broadcast MT test
        t, u, v, valid = triangle_intersect(cv0, cv1, cv2, ro_b, rd_b)
        tmin = jnp.min(t, axis=0)  # (P,)
        row = jnp.argmin(t, axis=0)
        take_row = lambda a: jnp.take_along_axis(a, row[None, :], axis=0)[0]
        better = tmin < bt
        gidx = chunk_id * _TRI_CHUNK + row
        return (
            jnp.where(better, tmin, bt),
            jnp.where(better, gidx, bidx),
            jnp.where(better, take_row(u), bu),
            jnp.where(better, take_row(v), bv),
        ), None

    init = (
        jnp.full((P,), FLT_MAX, jnp.float32),
        jnp.zeros((P,), jnp.int32),
        jnp.zeros((P,), jnp.float32),
        jnp.zeros((P,), jnp.float32),
    )
    (bt, bidx, bu, bv), _ = jax.lax.scan(
        body,
        init,
        (
            tv[0],
            tv[1],
            tv[2],
            jnp.arange(n_chunks, dtype=jnp.int32),
        ),
    )

    hit = bt < FLT_MAX
    gi = jnp.clip(bidx, 0, max(count - 1, 0))

    def take_tri(col):
        return jnp.take(
            jax.lax.slice_in_dim(col, start, start + count), gi, axis=0
        )

    n0 = Vec3(take_tri(scene.tri_n0.x), take_tri(scene.tri_n0.y), take_tri(scene.tri_n0.z))
    n1 = Vec3(take_tri(scene.tri_n1.x), take_tri(scene.tri_n1.y), take_tri(scene.tri_n1.z))
    n2 = Vec3(take_tri(scene.tri_n2.x), take_tri(scene.tri_n2.y), take_tri(scene.tri_n2.z))
    w = 1.0 - bu - bv
    n_obj = (n0 * w + n1 * bu + n2 * bv).normalize()

    if scene.mesh_has_uv[geom_index]:
        tex_u = (
            w * take_tri(scene.tri_uv0u)
            + bu * take_tri(scene.tri_uv1u)
            + bv * take_tri(scene.tri_uv2u)
        )
        tex_v = (
            w * take_tri(scene.tri_uv0v)
            + bu * take_tri(scene.tri_uv1v)
            + bv * take_tri(scene.tri_uv2v)
        )
    else:
        tex_u = tex_v = jnp.zeros_like(bt)

    p_obj = ro + rd * (bt - RAY_EPS)
    p_world = transform_point(xf, p_obj)
    n_world = transform_dir(inv_t, n_obj).normalize()
    outside = n_world.dot(dirs) < 0.0
    n_world = n_world * jnp.where(outside, 1.0, -1.0)
    dist = (origins - p_world).length()
    return jnp.where(hit, dist, MISS), n_world, outside, tex_u, tex_v


def intersect_scene(
    origins: Vec3,
    dirs: Vec3,
    scene: DeviceScene,
    use_bvh: bool = True,
) -> Intersections:
    """Min-t sweep over all geoms; per src/pathtrace.cu:176-211 update rule."""
    P = origins.x.shape[0]
    best_t = jnp.full((P,), MISS, jnp.float32)
    best_n = Vec3.zeros((P,))
    best_mat = jnp.full((P,), -1, jnp.int32)
    best_outside = jnp.ones((P,), bool)
    best_u = jnp.zeros((P,), jnp.float32)
    best_v = jnp.zeros((P,), jnp.float32)
    best_has_uv = jnp.zeros((P,), bool)

    for i, gt in enumerate(scene.gtypes):
        tex_u = tex_v = None
        if gt == int(GeomType.SPHERE):
            t, n, outside = sphere_intersect(
                scene.transform[i],
                scene.inverse_transform[i],
                scene.inv_transpose[i],
                origins,
                dirs,
            )
        elif gt == int(GeomType.CUBE):
            t, n, outside = box_intersect(
                scene.transform[i], scene.inverse_transform[i], origins, dirs
            )
        elif gt == int(GeomType.MESH):
            if use_bvh and scene.bvh_roots[i][1] > 0:
                from .bvh_traverse import mesh_intersect_bvh

                t, n, outside, tex_u, tex_v = mesh_intersect_bvh(
                    scene, i, origins, dirs
                )
            else:
                t, n, outside, tex_u, tex_v = _mesh_intersect_naive(
                    scene, i, origins, dirs
                )
        else:
            raise ValueError(f"unknown geom type {gt}")

        better = closer_hit(t, best_t)
        best_t = jnp.where(better, t, best_t)
        best_n = vwhere(better, n, best_n)
        best_mat = jnp.where(better, scene.geom_material_id[i], best_mat)
        best_outside = jnp.where(better, outside, best_outside)
        if tex_u is not None and scene.mesh_has_uv[i]:
            best_u = jnp.where(better, tex_u, best_u)
            best_v = jnp.where(better, tex_v, best_v)
            best_has_uv = jnp.where(better, True, best_has_uv)
        else:
            best_has_uv = jnp.where(better, False, best_has_uv)

    return Intersections(
        t=best_t, normal=best_n, material_id=best_mat, outside=best_outside,
        tex_u=best_u, tex_v=best_v, has_uv=best_has_uv,
    )
