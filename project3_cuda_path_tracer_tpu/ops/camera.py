"""Camera ray generation: pinhole + stochastic AA jitter + thin-lens DoF.

Pinhole direction math matches generateRayFromCamera
(/root/reference/src/pathtrace.cu:122-143):
    dir = normalize(view - right*pixelLength.x*(x - resx*0.5)
                         - up*pixelLength.y*(y - resy*0.5))
pixel index = x + y*resx (src/pathtrace.cu:128), color starts (1,1,1),
remainingBounces = traceDepth.

Extensions per INSTRUCTION.md:110-113:
- stochastic sampled antialiasing: jitter (x,y) by U[0,1) within the
  pixel footprint each iteration,
- physically-based depth of field: jitter origin on a concentric disk of
  radius `aperture` and re-aim at the focal plane.

RNG: 4 draws per pixel per iteration keyed (iter, pixelIndex, depth=0)
via the reference's seeding contract (src/pathtrace.cu:41-45).

All outputs are dense (P,) Vec3 lanes (ops/vec.py layout rule).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.device import DeviceCamera
from . import rng
from .vec import Vec3


def concentric_disk(u1: jnp.ndarray, u2: jnp.ndarray):
    """Low-distortion unit-disk sampling (PBRT 6.2.3 style) for the lens."""
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    r = jnp.where(jnp.abs(ox) > jnp.abs(oy), jnp.abs(ox), jnp.abs(oy))
    theta = jnp.where(
        jnp.abs(ox) > jnp.abs(oy),
        (jnp.pi / 4.0) * (oy / jnp.where(ox == 0, 1.0, ox)),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * (ox / jnp.where(oy == 0, 1.0, oy)),
    )
    degenerate = (ox == 0) & (oy == 0)
    x = jnp.where(degenerate, 0.0, r * jnp.cos(theta))
    y = jnp.where(degenerate, 0.0, r * jnp.sin(theta))
    return x, y


def generate_rays(
    cam: DeviceCamera,
    iteration: jnp.ndarray,
    antialias: bool,
    depth_of_field: bool,
    pix: jnp.ndarray | None = None,
):
    """Build the primary ray pool for the given pixel ids.

    `pix` defaults to arange(resx*resy) (pool slot i == pixel i,
    index = x + y*resx per src/pathtrace.cu:128); a sharded caller passes
    its device-local slice of global pixel ids.

    Returns (origins Vec3, dirs Vec3, pixel_index (P,) int32).
    """
    resx, resy = cam.resolution
    if pix is None:
        pix = jnp.arange(resx * resy, dtype=jnp.int32)
    x = (pix % resx).astype(jnp.float32)
    y = (pix // resx).astype(jnp.float32)

    if antialias or depth_of_field:
        u = rng.uniforms(iteration, pix, rng.RAYGEN_STREAM, 4)
    else:
        u = None

    if antialias:
        # STRATIFIED sub-pixel jitter (stochastic sampled AA,
        # INSTRUCTION.md:112; BASELINE config 3 "stratified jittered AA"):
        # iteration k lands in stratum k mod 16 of a 4x4 grid, so every
        # pixel covers all strata every 16 samples instead of clumping.
        K = 4
        s = (iteration - 1) % (K * K)
        sx = (s % K).astype(jnp.float32)
        sy = (s // K).astype(jnp.float32)
        x = x + (sx + u[0]) * (1.0 / K) - 0.5
        y = y + (sy + u[1]) * (1.0 / K) - 0.5

    sx = cam.pixel_length[0] * (x - resx * 0.5)
    sy = cam.pixel_length[1] * (y - resy * 0.5)
    view = Vec3(cam.view[0], cam.view[1], cam.view[2])
    right = Vec3(cam.right[0], cam.right[1], cam.right[2])
    up = Vec3(cam.up[0], cam.up[1], cam.up[2])
    dirs = (view - right * sx - up * sy).normalize()
    origins = Vec3.broadcast(cam.position, x.shape)

    if depth_of_field:
        # Thin-lens model (INSTRUCTION.md:110-111): sample the aperture
        # disk, keep the focal-plane point fixed.
        lens_x, lens_y = concentric_disk(u[2], u[3])
        lens_offset = right * (cam.aperture * lens_x) + up * (
            cam.aperture * lens_y
        )
        ft = cam.focal_distance / jnp.maximum(dirs.dot(view), 1e-6)
        focus_point = origins + dirs * ft
        origins = origins + lens_offset
        dirs = (focus_point - origins).normalize()

    return origins, dirs, pix
