"""Stackless BVH traversal over the path pool (pure XLA version).

Implements the "iterative traversal on the device" mandate of
/root/reference/INSTRUCTION.md:133-140,236 the TPU way: the flat
preorder + escape-pointer layout from models/bvh.py means each lane's
ENTIRE traversal state is one int32 cursor —
    hit node i's AABB ? (leaf ? test tris, go i+1 : descend to i+1)
                      : jump to skip[i]
so the whole pool advances in lock-step inside one lax.while_loop, with
per-lane cursors diverging only in *which* node they gather. No stack,
no recursion, static shapes. Lanes that finish early idle at the
past-the-end sentinel until the last lane exits (SIMT-style).

Leaf triangles (<= LEAF_SIZE, contiguous after the build reorder) are
tested with an unrolled fixed-size loop of lane-wise Möller–Trumbore
tests on gathered vertices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.bvh import LEAF_SIZE
from ..models.device import DeviceScene
from .intersect import (
    FLT_MAX,
    MISS,
    RAY_EPS,
    transform_dir,
    transform_point,
    triangle_intersect,
)
from .vec import Vec3, take as vtake


def _aabb_hit(nmin: Vec3, nmax: Vec3, o: Vec3, inv_d: Vec3, t_best):
    """Slab test vs per-lane AABBs; IEEE inf semantics for axis-parallel
    rays. Prunes nodes farther than the current best hit."""
    t1 = (nmin - o) * inv_d
    t2 = (nmax - o) * inv_d
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1.x, t2.x), jnp.minimum(t1.y, t2.y)),
        jnp.minimum(t1.z, t2.z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1.x, t2.x), jnp.maximum(t1.y, t2.y)),
        jnp.maximum(t1.z, t2.z),
    )
    return (tmax >= tmin) & (tmax > 0) & (tmin < t_best)


def mesh_intersect_bvh(
    scene: DeviceScene, geom_index: int, origins: Vec3, dirs: Vec3
):
    """BVH-accelerated mesh instance intersection.

    Returns (dist (P,), normal Vec3, outside (P,), tex_u (P,), tex_v (P,))
    with the same distance/normal/UV semantics as the naive sweep
    (ops/sweep.py)."""
    node_start, node_count = scene.bvh_roots[geom_index]
    node_end = node_start + node_count
    inv = scene.inverse_transform[geom_index]
    xf = scene.transform[geom_index]
    inv_t = scene.inv_transpose[geom_index]

    ro = transform_point(inv, origins)
    rd = transform_dir(inv, dirs).normalize()
    inv_d = Vec3(1.0 / rd.x, 1.0 / rd.y, 1.0 / rd.z)
    P = ro.x.shape[0]

    def gather_node(i):
        safe = jnp.clip(i, node_start, node_end - 1)
        g = lambda a: jnp.take(a, safe, axis=0)
        return (
            vtake(scene.bvh_min, safe),
            vtake(scene.bvh_max, safe),
            g(scene.bvh_first),
            g(scene.bvh_count),
            g(scene.bvh_skip),
            g(scene.bvh_leaf),
        )

    def gather_tri(idx):
        g = lambda v: vtake(v, idx)
        return g(scene.tri_v0), g(scene.tri_v1), g(scene.tri_v2)

    T = scene.tri_v0.x.shape[0]

    init = (
        jnp.full((P,), node_start, jnp.int32),  # cursor
        jnp.full((P,), FLT_MAX, jnp.float32),  # best t (object space)
        jnp.zeros((P,), jnp.int32),  # best tri
        jnp.zeros((P,), jnp.float32),  # best u
        jnp.zeros((P,), jnp.float32),  # best v
    )

    def cond(state):
        return jnp.any(state[0] < node_end)

    def body(state):
        cur, bt, btri, bu, bv = state
        active = cur < node_end
        nmin, nmax, first, count, skip, leaf = gather_node(cur)
        hit = _aabb_hit(nmin, nmax, ro, inv_d, bt) & active

        # Unrolled leaf test: LEAF_SIZE lane-wise MT tests.
        do_leaf = hit & leaf
        for k in range(LEAF_SIZE):
            tri = jnp.clip(first + k, 0, max(T - 1, 0))
            valid_k = do_leaf & (k < count)
            v0, v1, v2 = gather_tri(tri)
            t, u, v, ok = triangle_intersect(v0, v1, v2, ro, rd)
            better = valid_k & ok & (t < bt)
            bt = jnp.where(better, t, bt)
            btri = jnp.where(better, tri, btri)
            bu = jnp.where(better, u, bu)
            bv = jnp.where(better, v, bv)

        descend = hit & ~leaf
        nxt = jnp.where(descend, cur + 1, skip)
        cur = jnp.where(active, nxt, cur)
        return (cur, bt, btri, bu, bv)

    cur, bt, btri, bu, bv = jax.lax.while_loop(cond, body, init)

    hit = bt < FLT_MAX
    n0 = vtake(scene.tri_n0, btri)
    n1 = vtake(scene.tri_n1, btri)
    n2 = vtake(scene.tri_n2, btri)
    w = 1.0 - bu - bv
    n_obj = (n0 * w + n1 * bu + n2 * bv).normalize()

    if scene.mesh_has_uv[geom_index]:
        g = lambda a: jnp.take(a, btri, axis=0)
        tex_u = w * g(scene.tri_uv0u) + bu * g(scene.tri_uv1u) + bv * g(scene.tri_uv2u)
        tex_v = w * g(scene.tri_uv0v) + bu * g(scene.tri_uv1v) + bv * g(scene.tri_uv2v)
    else:
        tex_u = tex_v = jnp.zeros_like(bt)

    p_obj = ro + rd * (bt - RAY_EPS)
    p_world = transform_point(xf, p_obj)
    n_world = transform_dir(inv_t, n_obj).normalize()
    outside = n_world.dot(dirs) < 0.0
    n_world = n_world * jnp.where(outside, 1.0, -1.0)
    dist = (origins - p_world).length()
    return jnp.where(hit, dist, MISS), n_world, outside, tex_u, tex_v
