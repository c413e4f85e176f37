"""Ray-primitive intersection over the whole path pool (pure XLA version).

Reimplements the unit-object-space instance tests of
/root/reference/src/intersections.h as vectorized ops over SoA ray
buffers — one fused elementwise pipeline per geom, unrolled over the
(static, small) geom list exactly like the CUDA per-thread loop at
/root/reference/src/pathtrace.cu:176-199, but with the loop over *geoms*
unrolled at trace time and the loop over *rays* vectorized onto the VPU.

All vectors are Vec3 lanes (three dense (P,) arrays — see ops/vec.py for
why (P,3) tensors are a 42x HBM-traffic mistake on TPU).

Semantics preserved exactly:
- unit cube [-0.5,0.5]^3 slab test incl. inside/outside handling and the
  slab-winning normal (src/intersections.h:48-90),
- radius-0.5 sphere quadratic, nearer-positive-root, inside normal flip
  (src/intersections.h:102-144),
- object-space ray direction NORMALIZED before the test, returned "t" is
  the world-space euclidean distance |origin - hit|, -1 on miss,
- getPointOnRay's 1e-4 backoff (src/intersections.h:27-29),
- box normals via `transform` (not invTranspose) as the reference does
  (src/intersections.h:86), sphere normals via invTranspose (:138).

The 4x4 instance matrices are applied as explicit scalar-broadcast FMAs:
a (P,3)x(3,3) dot would route to the MXU whose f32 path truncates to
bfloat16 — catastrophic at world coords ~10 with 0.01-thick walls.

The fused Pallas twins of these tests live in ops/megakernel.py
(_box_test/_sphere_test/_mesh_test); this module is the XLA reference
implementation and the fallback for paths the megakernel doesn't cover.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .vec import Vec3

RAY_EPS = 1e-4  # getPointOnRay backoff, src/intersections.h:28
MISS = -1.0
FLT_MAX = 3.402823466e38


@dataclass
class Intersections:
    """SoA ShadeableIntersection (src/sceneStructs.h:72-76) + outside flag
    + interpolated texture coordinates for UV-mapped meshes
    (INSTRUCTION.md:114-116; zeros/False for analytic geoms and meshes
    without vt records — those fall back to box-projected UVs)."""

    t: jnp.ndarray  # (P,) world euclidean distance, -1 = miss
    normal: Vec3  # (P,) lanes, world normal, oriented per reference rules
    material_id: jnp.ndarray  # (P,) int32, -1 on miss
    outside: jnp.ndarray  # (P,) bool — ray originated outside the surface
    tex_u: jnp.ndarray = None  # (P,) barycentric-interpolated OBJ u
    tex_v: jnp.ndarray = None  # (P,)
    has_uv: jnp.ndarray = None  # (P,) bool — tex_u/v valid on this lane

    def __post_init__(self):
        if self.tex_u is None:
            shape = self.t.shape
            self.tex_u = jnp.zeros(shape, jnp.float32)
            self.tex_v = jnp.zeros(shape, jnp.float32)
            self.has_uv = jnp.zeros(shape, bool)


jax.tree_util.register_dataclass(
    Intersections,
    data_fields=["t", "normal", "material_id", "outside", "tex_u", "tex_v", "has_uv"],
    meta_fields=[],
)


def transform_point(m, p: Vec3) -> Vec3:
    """(4,4) @ [p,1] as scalar-broadcast FMAs (multiplyMV analog)."""
    return Vec3(
        m[0, 0] * p.x + m[0, 1] * p.y + m[0, 2] * p.z + m[0, 3],
        m[1, 0] * p.x + m[1, 1] * p.y + m[1, 2] * p.z + m[1, 3],
        m[2, 0] * p.x + m[2, 1] * p.y + m[2, 2] * p.z + m[2, 3],
    )


def transform_dir(m, d: Vec3) -> Vec3:
    """(4,4) @ [d,0] as scalar-broadcast FMAs."""
    return Vec3(
        m[0, 0] * d.x + m[0, 1] * d.y + m[0, 2] * d.z,
        m[1, 0] * d.x + m[1, 1] * d.y + m[1, 2] * d.z,
        m[2, 0] * d.x + m[2, 1] * d.y + m[2, 2] * d.z,
    )


def _slab_axis(o, d):
    """Per-axis slab interval + entering-face sign (src/intersections.h:58-76).

    Returns (ta, tb, sign) for one axis of the unit cube.
    """
    t1 = (-0.5 - o) / d
    t2 = (0.5 - o) / d
    ta = jnp.minimum(t1, t2)
    tb = jnp.maximum(t1, t2)
    sign = jnp.where(t2 < t1, 1.0, -1.0)  # n[xyz] per :66
    return ta, tb, sign


def box_intersect(transform, inverse_transform, origins: Vec3, dirs: Vec3):
    """Batched boxIntersectionTest (src/intersections.h:48-90).

    Returns (dist (P,), normal Vec3, outside (P,))."""
    q_o = transform_point(inverse_transform, origins)
    q_d = transform_dir(inverse_transform, dirs).normalize()

    tax, tbx, sx = _slab_axis(q_o.x, q_d.x)
    tay, tby, sy = _slab_axis(q_o.y, q_d.y)
    taz, tbz, sz = _slab_axis(q_o.z, q_d.z)

    # tmin = max over axes of positive ta (start -1e38); track which axis
    # won to build the entering-face normal. Unrolled 3-way max.
    tax_m = jnp.where(tax > 0, tax, -FLT_MAX)
    tay_m = jnp.where(tay > 0, tay, -FLT_MAX)
    taz_m = jnp.where(taz > 0, taz, -FLT_MAX)
    tmin = jnp.maximum(tax_m, jnp.maximum(tay_m, taz_m))
    tmax = jnp.minimum(tbx, jnp.minimum(tby, tbz))

    # Entering-face normal: one-hot on the winning axis, signed.
    win_x = tmin == tax_m
    win_y = (~win_x) & (tmin == tay_m)
    n_in = Vec3(
        jnp.where(win_x, sx, 0.0),
        jnp.where(win_y, sy, 0.0),
        jnp.where(win_x | win_y, 0.0, sz),
    )
    # Exit-face normal (used when the ray starts inside, :81-84).
    ex_x = tmax == tbx
    ex_y = (~ex_x) & (tmax == tby)
    n_out = Vec3(
        jnp.where(ex_x, sx, 0.0),
        jnp.where(ex_y, sy, 0.0),
        jnp.where(ex_x | ex_y, 0.0, sz),
    )

    hit = (tmax >= tmin) & (tmax > 0)
    inside = tmin <= 0
    t_obj = jnp.where(inside, tmax, tmin)
    n_obj = Vec3(
        jnp.where(inside, n_out.x, n_in.x),
        jnp.where(inside, n_out.y, n_in.y),
        jnp.where(inside, n_out.z, n_in.z),
    )
    outside = ~inside

    p_obj = q_o + q_d * (t_obj - RAY_EPS)
    p_world = transform_point(transform, p_obj)
    # Reference computes box normals with `transform` (src/intersections.h:86).
    n_world = transform_dir(transform, n_obj).normalize()
    dist = (origins - p_world).length()
    return jnp.where(hit, dist, MISS), n_world, outside


def sphere_intersect(
    transform, inverse_transform, inv_transpose, origins: Vec3, dirs: Vec3
):
    """Batched sphereIntersectionTest (src/intersections.h:102-144)."""
    ro = transform_point(inverse_transform, origins)
    rd = transform_dir(inverse_transform, dirs).normalize()

    v_dot_d = ro.dot(rd)
    radicand = v_dot_d * v_dot_d - (ro.dot(ro) - 0.25)
    has_root = radicand >= 0
    sq = jnp.sqrt(jnp.maximum(radicand, 0.0))
    t1 = -v_dot_d + sq
    t2 = -v_dot_d - sq

    both_neg = (t1 < 0) & (t2 < 0)
    both_pos = (t1 > 0) & (t2 > 0)
    t_obj = jnp.where(both_pos, jnp.minimum(t1, t2), jnp.maximum(t1, t2))
    outside = both_pos
    hit = has_root & ~both_neg

    p_obj = ro + rd * (t_obj - RAY_EPS)
    p_world = transform_point(transform, p_obj)
    n_world = transform_dir(inv_transpose, p_obj).normalize()
    flip = jnp.where(outside, 1.0, -1.0)
    n_world = n_world * flip
    dist = (origins - p_world).length()
    return jnp.where(hit, dist, MISS), n_world, outside


def triangle_intersect(v0: Vec3, v1: Vec3, v2: Vec3, o: Vec3, d: Vec3):
    """Möller–Trumbore, lane-wise: each lane tests its own triangle
    (v* may be broadcast constants or per-lane gathered vertices).
    The glm::intersectRayTriangle analog (INSTRUCTION.md:127).

    Returns (t (P,), u, v, valid) with t=FLT_MAX when invalid."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = d.cross(e2)
    det = e1.dot(pvec)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = tvec.dot(pvec) * inv_det
    qvec = tvec.cross(e1)
    v = d.dot(qvec) * inv_det
    t = e2.dot(qvec) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > RAY_EPS)
    )
    return jnp.where(valid, t, FLT_MAX), u, v, valid


def closer_hit(t_new: jnp.ndarray, t_best: jnp.ndarray) -> jnp.ndarray:
    """Min-t update rule per src/pathtrace.cu:192 (t > 0 && t_min > t),
    with t_best==MISS treated as FLT_MAX."""
    best = jnp.where(t_best > 0, t_best, FLT_MAX)
    return (t_new > 0) & (best > t_new)
