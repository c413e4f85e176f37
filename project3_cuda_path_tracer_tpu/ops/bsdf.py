"""BSDF sampling and path scattering — the full scatterRay contract.

The reference stubs scatterRay (/root/reference/src/interactions.h:69-79)
but documents its contract in comments (:44-67) and the assignment spec
(INSTRUCTION.md:70-109):
- ideal diffuse via the provided cosine-weighted hemisphere sampler
  (src/interactions.h:10-42, reimplemented verbatim below),
- perfect specular mirror (glm::reflect),
- refraction with Snell's law + Schlick Fresnel (INSTRUCTION.md:105-109),
- probabilistic mixing between effects with probability-division
  compensation (src/interactions.h:55-62),
- emissive surfaces terminate the path multiplying color*emittance
  (src/pathtrace.cu:247-249),
- misses terminate with black (src/pathtrace.cu:262-264).

TPU-first shape: every lane evaluates every branch and a `jnp.where`
tree selects — branchless on the VPU over dense (P,) Vec3 lanes
(ops/vec.py), so "warp divergence" does not exist here (material sort
remains available as a toggle for parity and for tiled-Pallas coherence
experiments).

Per-bounce RNG draw layout (fixed so every lane consumes the same count,
keeping lanes in lockstep): u0 = branch lottery, (u1,u2) = hemisphere,
u3 = Fresnel lottery, u4 = Russian roulette.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.math3d import SQRT_OF_ONE_THIRD, TWO_PI
from .vec import Vec3, where as vwhere

RAY_EPS = 1e-4


def cosine_hemisphere(normal: Vec3, u1: jnp.ndarray, u2: jnp.ndarray) -> Vec3:
    """calculateRandomDirectionInHemisphere (src/interactions.h:10-42),
    vectorized over dense lanes."""
    up = jnp.sqrt(u1)  # cos(theta)
    over = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))  # sin(theta)
    around = u2 * TWO_PI

    # "not the normal" axis trick (Peter Kutz) — :24-31
    use_x = jnp.abs(normal.x) < SQRT_OF_ONE_THIRD
    use_y = (~use_x) & (jnp.abs(normal.y) < SQRT_OF_ONE_THIRD)
    one = jnp.ones_like(normal.x)
    zero = jnp.zeros_like(normal.x)
    not_normal = Vec3(
        jnp.where(use_x, one, zero),
        jnp.where(use_y, one, zero),
        jnp.where(use_x | use_y, zero, one),
    )
    perp1 = normal.cross(not_normal).normalize()
    perp2 = normal.cross(perp1).normalize()
    cos_a = jnp.cos(around) * over
    sin_a = jnp.sin(around) * over
    return normal * up + perp1 * cos_a + perp2 * sin_a


def reflect(d: Vec3, n: Vec3) -> Vec3:
    """glm::reflect: d - 2*dot(d,n)*n."""
    return d - n * (2.0 * d.dot(n))


def phong_lobe(axis: Vec3, exponent: jnp.ndarray, u1, u2) -> Vec3:
    """Sample a power-cosine (Phong) lobe around `axis`: imperfect
    specular via SPECEX (the reference parses Material::specular.exponent
    at src/scene.cpp:170-171 but its starter never consumes it;
    'non-perfect specular' is the recommended extension,
    INSTRUCTION.md:108). cos(theta) = u1^(1/(e+1))."""
    cos_t = u1 ** (1.0 / (exponent + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = u2 * TWO_PI
    # frame around the axis (not-normal trick)
    use_x = jnp.abs(axis.x) < SQRT_OF_ONE_THIRD
    use_y = (~use_x) & (jnp.abs(axis.y) < SQRT_OF_ONE_THIRD)
    one = jnp.ones_like(axis.x)
    zero = jnp.zeros_like(axis.x)
    nn = Vec3(
        jnp.where(use_x, one, zero),
        jnp.where(use_y, one, zero),
        jnp.where(use_x | use_y, zero, one),
    )
    t1 = axis.cross(nn).normalize()
    t2 = axis.cross(t1).normalize()
    return (
        axis * cos_t + t1 * (jnp.cos(phi) * sin_t) + t2 * (jnp.sin(phi) * sin_t)
    )


def refract(d: Vec3, n: Vec3, eta: jnp.ndarray):
    """glm::refract + TIR flag. n oriented against d; eta (P,) = n1/n2."""
    cos_i = -d.dot(n)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k < 0.0
    refr = d * eta + n * (eta * cos_i - jnp.sqrt(jnp.maximum(k, 0.0)))
    return refr, tir


def schlick(cos_i: jnp.ndarray, ior: jnp.ndarray) -> jnp.ndarray:
    """Schlick's approximation of Fresnel reflectance (INSTRUCTION.md:106)."""
    r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    m = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    return r0 + (1.0 - r0) * m * m * m * m * m


def scatter(
    origins: Vec3,
    dirs: Vec3,
    t: jnp.ndarray,  # (P,) intersection distance (world euclidean)
    normal: Vec3,  # oriented world normal
    outside: jnp.ndarray,  # (P,) bool
    # gathered material columns:
    m_color: Vec3,
    m_spec_color: Vec3,
    m_has_refl: jnp.ndarray,
    m_has_refr: jnp.ndarray,
    m_ior: jnp.ndarray,
    m_emittance: jnp.ndarray,
    m_spec_exp: jnp.ndarray | None,  # SPECEX column; None = all perfect
    u_hemi1: jnp.ndarray,  # (P,) hemisphere xi_1
    u_hemi2: jnp.ndarray,  # (P,) hemisphere xi_2
    u_branch: jnp.ndarray | None = None,  # spec/diffuse lottery; None when
    # every material's REFL is 0 or 1 (pick is then deterministic)
    u_fresnel: jnp.ndarray | None = None,  # Fresnel lottery; None when the
    # scene has no refractive materials (whole glass branch traced away)
    m_sss: jnp.ndarray | None = None,  # SSS extinction sigma; None = none
    t_segment: jnp.ndarray | None = None,  # segment length for absorption
):
    """One shading step for all lanes.

    Returns (new_origins, new_dirs, throughput_multiplier Vec3,
    emitted Vec3, terminate (P,) bool). throughput_multiplier includes
    probability compensation per src/interactions.h:55-62.

    The optional draws make the shader scene-specialized: passing None
    statically removes that branch's RNG cost (and for u_fresnel the
    entire refract/TIR computation) from the compiled program.
    """
    p_hit = origins + dirs * (t - RAY_EPS)  # getPointOnRay semantics

    emissive = m_emittance > 0.0
    refractive = m_has_refr > 0.0
    reflective = m_has_refl > 0.0

    # ---- diffuse branch ----
    diff_dir = cosine_hemisphere(normal, u_hemi1, u_hemi2)

    # ---- mirror branch (Phong-glossy when SPECEX > 0) ----
    spec_dir = reflect(dirs, normal)
    if m_spec_exp is not None:
        glossy = phong_lobe(spec_dir, m_spec_exp, u_hemi1, u_hemi2)
        # keep the mirror ray when the lobe sample dips below the surface
        ok = glossy.dot(normal) > 0.0
        imperfect = m_spec_exp > 0.0
        spec_dir = vwhere(imperfect & ok, glossy, spec_dir)

    # ---- reflective/diffuse probabilistic mix ----
    # hasReflective in (0,1] is the specular branch probability; the
    # chosen branch's contribution is divided by its probability
    # (src/interactions.h:55-62). hasReflective==1 -> pure mirror.
    if u_branch is not None:
        p_spec = jnp.clip(m_has_refl, 0.0, 1.0)
        pick_spec = u_branch < p_spec
        inv_p = 1.0 / jnp.maximum(p_spec, 1e-6)
        inv_q = 1.0 / jnp.maximum(1.0 - p_spec, 1e-6)
        mix_dir = vwhere(pick_spec, spec_dir, diff_dir)
        mix_tint = vwhere(pick_spec, m_spec_color * inv_p, m_color * inv_q)
    else:
        # all REFL values are 0 or 1: reflective lanes are pure mirrors
        mix_dir = spec_dir
        mix_tint = m_spec_color

    new_dir = vwhere(reflective, mix_dir, diff_dir)
    tint = vwhere(reflective, mix_tint, m_color)
    new_origin = p_hit

    # ---- refractive branch (Fresnel lottery via Schlick) ----
    if u_fresnel is not None:
        eta = jnp.where(outside, 1.0 / jnp.maximum(m_ior, 1e-6), m_ior)
        cos_i = jnp.clip(-dirs.dot(normal), 0.0, 1.0)
        fresnel = schlick(cos_i, jnp.maximum(m_ior, 1.0))
        refr_dir, tir = refract(dirs, normal, eta)
        do_reflect_glass = tir | (u_fresnel < fresnel)
        glass_dir = vwhere(do_reflect_glass, spec_dir, refr_dir.normalize())
        glass_tint = vwhere(do_reflect_glass, m_spec_color, m_color)
        # push refracted rays through the interface; reflected stay outside
        glass_origin = vwhere(
            do_reflect_glass, p_hit, p_hit + glass_dir * (2.0 * RAY_EPS + 1e-3)
        )
        new_dir = vwhere(refractive, glass_dir, new_dir)
        tint = vwhere(refractive, glass_tint, tint)
        new_origin = vwhere(refractive, glass_origin, new_origin)

    # ---- subsurface branch (INSTRUCTION.md:121, diffusion-lite) ----
    # Entry (outside): diffuse TRANSMISSION — cosine hemisphere around
    # the inward normal, tinted by the surface color. Exit (inside): the
    # returned normal points back toward the ray (inward), so -normal is
    # outward — same sampling exits the medium — with Beer-Lambert
    # absorption exp(-sigma * path length inside).
    if m_sss is not None:
        sss = m_sss > 0.0
        inward = -normal  # inward on entry, outward on exit (see above)
        sss_dir = cosine_hemisphere(inward, u_hemi1, u_hemi2)
        att = jnp.exp(-m_sss * t_segment)
        sss_tint = vwhere(outside, m_color, Vec3(att, att, att))
        sss_origin = p_hit + sss_dir * (2.0 * RAY_EPS + 1e-3)
        new_dir = vwhere(sss, sss_dir, new_dir)
        tint = vwhere(sss, sss_tint, tint)
        new_origin = vwhere(sss, sss_origin, new_origin)

    emitted = m_color * m_emittance
    terminate = emissive

    return new_origin, new_dir.normalize(), tint, emitted, terminate
