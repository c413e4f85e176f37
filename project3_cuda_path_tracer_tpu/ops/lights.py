"""Direct lighting: explicit light sampling (next-event estimation).

INSTRUCTION.md:117-118 — "taking a final ray directly to a random point
on an emissive object acting as a light source". Implemented as proper
single-sample area NEE at the final bounce: sample a uniform point on a
(uniformly chosen) emissive geom's surface, shoot one shadow ray, and
add   throughput * albedo/pi * Le * cos_s * cos_l / r^2 * A * N_lights
for unoccluded diffuse lanes. This replaces the final hemisphere gamble
(which would almost always miss a small light) with a zero-variance-in-
visibility estimate — the classic variance win for small lights.

Light surface sampling supports the two analytic primitives:
- cube: faces chosen by world-area weights |c_i x c_j| from the
  instance transform's columns; point uniform on the chosen face.
- sphere: uniform direction scaled to radius 0.5 in object space
  (world area assumes uniform scale, like the canonical scenes).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.device import DeviceScene
from ..models.scene import GeomType
from ..utils.math3d import TWO_PI
from .intersect import transform_dir, transform_point
from .vec import Vec3, where as vwhere


def _cube_light_sample(xf, inv_t, u1, u2, u3):
    """Uniform point on a transformed unit cube's surface.

    Returns (point Vec3, normal Vec3, total world area scalar)."""
    c0 = Vec3(xf[0, 0], xf[1, 0], xf[2, 0])
    c1 = Vec3(xf[0, 1], xf[1, 1], xf[2, 1])
    c2 = Vec3(xf[0, 2], xf[1, 2], xf[2, 2])
    a_x = c1.cross(c2).length()  # +-x faces
    a_y = c0.cross(c2).length()
    a_z = c0.cross(c1).length()
    total = 2.0 * (a_x + a_y + a_z)

    t = u3 * total
    # face picker: [ax, ax, ay, ay, az, az] cumulative
    pick_x = t < 2 * a_x
    pick_y = (~pick_x) & (t < 2 * a_x + 2 * a_y)
    # sign: second half of each pair
    sgn_x = jnp.where(t < a_x, 0.5, -0.5)
    sgn_y = jnp.where(t - 2 * a_x < a_y, 0.5, -0.5)
    sgn_z = jnp.where(t - 2 * a_x - 2 * a_y < a_z, 0.5, -0.5)

    e1 = u1 - 0.5
    e2 = u2 - 0.5
    px = jnp.where(pick_x, sgn_x, jnp.where(pick_y, e1, e1))
    py = jnp.where(pick_x, e1, jnp.where(pick_y, sgn_y, e2))
    pz = jnp.where(pick_x, e2, jnp.where(pick_y, e2, sgn_z))
    p_obj = Vec3(px, py, pz)

    nx = jnp.where(pick_x, jnp.sign(sgn_x), 0.0)
    ny = jnp.where(pick_y, jnp.sign(sgn_y), 0.0)
    nz = jnp.where(pick_x | pick_y, 0.0, jnp.sign(sgn_z))
    n_obj = Vec3(nx, ny, nz)

    p_world = transform_point(xf, p_obj)
    n_world = transform_dir(inv_t, n_obj).normalize()
    return p_world, n_world, total


def _sphere_light_sample(xf, inv_t, u1, u2):
    """Uniform point on a transformed radius-0.5 sphere (uniform scale
    assumed for the area term)."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = TWO_PI * u2
    d_obj = Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)
    p_obj = d_obj * 0.5
    p_world = transform_point(xf, p_obj)
    n_world = transform_dir(inv_t, p_obj).normalize()
    scale = Vec3(xf[0, 0], xf[1, 0], xf[2, 0]).length()
    area = jnp.pi * scale * scale  # 4*pi*(0.5*scale)^2
    return p_world, n_world, area


def sample_lights(scene: DeviceScene, u_light, u1, u2):
    """Sample one point on one (uniformly chosen) emissive geom per lane.

    Returns (point Vec3, normal Vec3, weight = area * n_lights, Le Vec3)
    where weight is the 1/pdf of the (light, point) choice and Le the
    chosen light's emitted radiance (color * emittance)."""
    lights = scene.emissive_geoms
    n = len(lights)
    assert n > 0, "direct lighting requires an emissive geom"

    shape = u1.shape
    point = Vec3.zeros(shape)
    normal = Vec3.zeros(shape)
    weight = jnp.zeros(shape)
    le = Vec3.zeros(shape)

    for k, gi in enumerate(lights):
        xf = scene.transform[gi]
        inv_t = scene.inv_transpose[gi]
        if scene.gtypes[gi] == int(GeomType.SPHERE):
            p, nrm, area = _sphere_light_sample(xf, inv_t, u1, u2)
        else:
            # the face picker consumes u_light's fractional remainder
            p, nrm, area = _cube_light_sample(
                xf, inv_t, u1, u2, (u_light * n) % 1.0
            )
        mid = scene.geom_material_id[gi]
        emit = jnp.take(scene.mat_emittance, mid)
        le_k = Vec3(
            jnp.take(scene.mat_color.x, mid) * emit,
            jnp.take(scene.mat_color.y, mid) * emit,
            jnp.take(scene.mat_color.z, mid) * emit,
        )
        pick = jnp.floor(u_light * n).astype(jnp.int32) == k
        point = vwhere(pick, p, point)
        normal = vwhere(pick, nrm, normal)
        weight = jnp.where(pick, area * n, weight)
        le = vwhere(pick, Vec3.broadcast((le_k.x, le_k.y, le_k.z), shape), le)

    return point, normal, weight, le
