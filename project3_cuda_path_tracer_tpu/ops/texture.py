"""Texture + bump mapping (INSTRUCTION.md:114-116): a procedural
checker and file-loaded image textures, with height-map bump mapping.

Two UV parameterizations, chosen per lane:
- meshes with OBJ vt records use their own per-face UVs, interpolated
  barycentrically at intersection time (Intersections.tex_u/v — the
  arbitrary-mesh texture mapping of INSTRUCTION.md:114-116),
- everything else gets box-projected world space: the hit point's two
  coordinates orthogonal to the dominant normal axis, scaled by the
  material's TEXSCALE and wrapped — tri-planar-lite that works for
  walls, floors and curved analytic surfaces without UVs.

Sampling is nearest-neighbor from a flattened dense atlas: (N,R,R)
images stored as (N*R*R,) rank-1 channels (the ops/vec.py layout rule),
fetched with one gather per channel.
"""

from __future__ import annotations

import jax.numpy as jnp

from .vec import Vec3

TEX_RES = 256


def box_uv(p: Vec3, n: Vec3, scale: jnp.ndarray):
    """World-space box-projected UV in [0,1): pick the two coordinates
    orthogonal to the dominant normal axis."""
    ax, ay, az = jnp.abs(n.x), jnp.abs(n.y), jnp.abs(n.z)
    dom_x = (ax >= ay) & (ax >= az)
    dom_y = (~dom_x) & (ay >= az)
    u = jnp.where(dom_x, p.z, jnp.where(dom_y, p.x, p.x))
    v = jnp.where(dom_x, p.y, jnp.where(dom_y, p.z, p.y))
    u = u * scale
    v = v * scale
    return u - jnp.floor(u), v - jnp.floor(v)


def checker(p: Vec3, scale: jnp.ndarray) -> jnp.ndarray:
    """3D procedural checkerboard: 1.0 / 0.35 by cell parity."""
    s = (
        jnp.floor(p.x * scale) + jnp.floor(p.y * scale) + jnp.floor(p.z * scale)
    ).astype(jnp.int32)
    return jnp.where((s & 1) == 0, 1.0, 0.35)


def _gather(channel_flat: jnp.ndarray, tex_id, u, v) -> jnp.ndarray:
    """Nearest-neighbor fetch (bump-map taps use this: the finite
    differences want raw texels, not prefiltered ones)."""
    ix = jnp.clip((u * TEX_RES).astype(jnp.int32), 0, TEX_RES - 1)
    iy = jnp.clip((v * TEX_RES).astype(jnp.int32), 0, TEX_RES - 1)
    flat = (tex_id * TEX_RES + iy) * TEX_RES + ix
    return jnp.take(channel_flat, flat, axis=0)


def _gather_bilinear(channel_flat: jnp.ndarray, tex_id, u, v) -> jnp.ndarray:
    """Bilinear fetch with wrap addressing (texel centers at
    (i+0.5)/R — the standard half-texel offset)."""
    fx = u * TEX_RES - 0.5
    fy = v * TEX_RES - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32) % TEX_RES
    y0i = y0.astype(jnp.int32) % TEX_RES
    x1i = (x0i + 1) % TEX_RES
    y1i = (y0i + 1) % TEX_RES
    base = tex_id * TEX_RES

    def tap(iy, ix):
        return jnp.take(channel_flat, (base + iy) * TEX_RES + ix, axis=0)

    c00 = tap(y0i, x0i)
    c01 = tap(y0i, x1i)
    c10 = tap(y1i, x0i)
    c11 = tap(y1i, x1i)
    top = c00 * (1 - wx) + c01 * wx
    bot = c10 * (1 - wx) + c11 * wx
    return top * (1 - wy) + bot * wy


def sample_file_texture(tex_r, tex_g, tex_b, tex_id, u, v) -> Vec3:
    """Bilinear-filtered albedo fetch from the flattened atlas."""
    return Vec3(
        _gather_bilinear(tex_r, tex_id, u, v),
        _gather_bilinear(tex_g, tex_id, u, v),
        _gather_bilinear(tex_b, tex_id, u, v),
    )


ENV_H, ENV_W = 256, 512  # models/scene.py::_load_env_map resampling


def env_radiance(scene, dirs: Vec3) -> Vec3:
    """Environment radiance for escaped rays (extension — the reference
    background is constant black, src/sceneStructs.h:8): the constant
    ENVLIGHT color, replaced per lane by the lat-long ENVMAP sample
    when one is loaded. Lat-long convention: u from atan2(z,x), v from
    acos(y) (y-up world)."""
    r = jnp.zeros_like(dirs.x) + scene.env_color[0]
    g = jnp.zeros_like(dirs.x) + scene.env_color[1]
    b = jnp.zeros_like(dirs.x) + scene.env_color[2]
    if scene.has_env_map:
        u = jnp.arctan2(dirs.z, dirs.x) * (0.5 / jnp.pi) + 0.5
        v = jnp.arccos(jnp.clip(dirs.y, -1.0, 1.0)) * (1.0 / jnp.pi)
        ix = jnp.clip((u * ENV_W).astype(jnp.int32), 0, ENV_W - 1)
        iy = jnp.clip((v * ENV_H).astype(jnp.int32), 0, ENV_H - 1)
        flat = iy * ENV_W + ix
        r = jnp.take(scene.env_r, flat, axis=0)
        g = jnp.take(scene.env_g, flat, axis=0)
        b = jnp.take(scene.env_b, flat, axis=0)
    return Vec3(r, g, b)


def apply_textures(scene, p_hit: Vec3, normal: Vec3, mat_id: jnp.ndarray,
                   base_color: Vec3, tex_u=None, tex_v=None, has_uv=None):
    """Modulate albedo by the material's texture (checker or file) and
    perturb the shading normal by its bump map. Returns (color, normal).

    tex_u/tex_v/has_uv (from Intersections): lanes that hit a UV-mapped
    mesh sample the texture by the OBJ's own parameterization
    (INSTRUCTION.md:114-116); all other lanes use the box projection.

    Static scene flags (any_textured/any_bump) gate tracing so untextured
    scenes pay nothing."""
    safe = jnp.maximum(mat_id, 0)
    kind = jnp.take(scene.mat_tex_kind, safe)
    scale = jnp.take(scene.mat_tex_scale, safe)

    def pick_uv(u_box, v_box):
        if tex_u is None or has_uv is None:
            return u_box, v_box
        um = tex_u - jnp.floor(tex_u)  # OBJ wrap
        vm = 1.0 - (tex_v - jnp.floor(tex_v))  # OBJ v is bottom-up
        return jnp.where(has_uv, um, u_box), jnp.where(has_uv, vm, v_box)

    color = base_color
    if scene.any_textured:
        u, v = pick_uv(*box_uv(p_hit, normal, scale))
        ck = checker(p_hit, scale)
        color = Vec3(
            jnp.where(kind == 1, base_color.x * ck, base_color.x),
            jnp.where(kind == 1, base_color.y * ck, base_color.y),
            jnp.where(kind == 1, base_color.z * ck, base_color.z),
        )
        if scene.n_file_textures > 0:
            tid = jnp.take(scene.mat_tex_id, safe)
            tc = sample_file_texture(
                scene.tex_r, scene.tex_g, scene.tex_b, tid, u, v
            )
            is_file = kind == 2
            color = Vec3(
                jnp.where(is_file, base_color.x * tc.x, color.x),
                jnp.where(is_file, base_color.y * tc.y, color.y),
                jnp.where(is_file, base_color.z * tc.z, color.z),
            )

    if scene.any_bump:
        bid = jnp.take(scene.mat_bump_id, safe)
        bscale = jnp.take(scene.mat_bump_scale, safe)
        has_bump = bid >= 0
        bid_c = jnp.maximum(bid, 0)
        u, v = pick_uv(*box_uv(p_hit, normal, scale))
        eps = 1.0 / TEX_RES
        h0 = _gather(scene.bump_h, bid_c, u, v)
        hu = _gather(scene.bump_h, bid_c, (u + eps) % 1.0, v)
        hv = _gather(scene.bump_h, bid_c, u, (v + eps) % 1.0)
        dhdu = (hu - h0) / eps
        dhdv = (hv - h0) / eps
        # tangent frame via the not-normal-axis trick (interactions.h:24)
        from ..utils.math3d import SQRT_OF_ONE_THIRD

        use_x = jnp.abs(normal.x) < SQRT_OF_ONE_THIRD
        use_y = (~use_x) & (jnp.abs(normal.y) < SQRT_OF_ONE_THIRD)
        one = jnp.ones_like(normal.x)
        zero = jnp.zeros_like(normal.x)
        nn = Vec3(
            jnp.where(use_x, one, zero),
            jnp.where(use_y, one, zero),
            jnp.where(use_x | use_y, zero, one),
        )
        t1 = normal.cross(nn).normalize()
        t2 = normal.cross(t1).normalize()
        perturbed = (
            normal + (t1 * dhdu + t2 * dhdv) * (-bscale * 0.1)
        ).normalize()
        normal = Vec3(
            jnp.where(has_bump, perturbed.x, normal.x),
            jnp.where(has_bump, perturbed.y, normal.y),
            jnp.where(has_bump, perturbed.z, normal.z),
        )

    return color, normal
