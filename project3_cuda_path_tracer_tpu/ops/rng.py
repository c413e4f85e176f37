"""Counter-based per-path RNG reproducing the reference's semantics.

The reference seeds a thrust::default_random_engine (minstd LCG,
multiplier 48271 modulo 2^31-1) per (iter, path index, depth) with
    h = utilhash((1 << 31) | (depth << 22) | iter) ^ utilhash(index)
per /root/reference/src/pathtrace.cu:41-45 and draws U(0,1) floats from
it (src/pathtrace.cu:240-241, src/interactions.h:13). utilhash is the
6-round Thomas-Wang-style integer hash at src/intersections.h:12-20.

We reimplement both exactly in vectorized uint32/int32 jnp math so every
lane of the path pool owns an independent, statistically identical
stream, reseeded each bounce — fully stateless across depths, which is
exactly what a `lax.scan` wants.

One deliberate deviation (documented in SURVEY.md §7): we key the stream
on the path's *pixelIndex* rather than its position in the pool, so that
compaction/material-sort permutations are radiometrically neutral (the
reference's `idx` changes under thrust::partition, making its toggles
alter the noise pattern; ours don't).

The LCG advance uses Schrage's method so everything stays in int32 —
no 64-bit math needed on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

_LCG_M = 2147483647  # 2^31 - 1
_LCG_A = 48271
_LCG_Q = _LCG_M // _LCG_A  # 44488
_LCG_R = _LCG_M % _LCG_A  # 3399

# Depth-slot used to seed the camera-jitter draws (AA/DoF). Kept distinct
# from every bounce depth so raygen and depth-0 shading consume
# independent streams (the naive choice of depth=0 for both would hand
# the hemisphere sampler the same numbers as the pixel jitter).
RAYGEN_STREAM = 255


def utilhash(a: jnp.ndarray) -> jnp.ndarray:
    """Vectorized uint32 hash; bit-exact vs src/intersections.h:12-20."""
    a = a.astype(jnp.uint32)
    a = (a + jnp.uint32(0x7ED55D16)) + (a << 12)
    a = (a ^ jnp.uint32(0xC761C23C)) ^ (a >> 19)
    a = (a + jnp.uint32(0x165667B1)) + (a << 5)
    a = (a + jnp.uint32(0xD3A2646C)) ^ (a << 9)
    a = (a + jnp.uint32(0xFD7046C5)) + (a << 3)
    a = (a ^ jnp.uint32(0xB55A4F09)) ^ (a >> 16)
    return a


def make_seeded_state(iter_: jnp.ndarray, index: jnp.ndarray, depth) -> jnp.ndarray:
    """Seed per src/pathtrace.cu:41-45, normalized for minstd (state in
    [1, m-1] like thrust's linear_congruential_engine constructor)."""
    iter_ = jnp.asarray(iter_, jnp.uint32)
    depth = jnp.asarray(depth, jnp.uint32)
    index = jnp.asarray(index, jnp.uint32)
    h = utilhash((jnp.uint32(1) << 31) | (depth << 22) | iter_) ^ utilhash(index)
    # h mod (2^31-1) without division: fold the top bit (2^31 == 1 mod M)
    s = (h >> 31) + (h & jnp.uint32(0x7FFFFFFF))
    s = jnp.where(s >= jnp.uint32(_LCG_M), s - jnp.uint32(_LCG_M), s)
    state = s.astype(jnp.int32)
    return jnp.where(state == 0, jnp.int32(1), state)


def lcg_next(state: jnp.ndarray) -> jnp.ndarray:
    """One minstd step x <- 48271*x mod (2^31-1), division-free.

    Integer division is emulated (slow) on the TPU VPU, so instead of
    Schrage we use 2^31 = 1 (mod M): split the 47-bit product into
    uint32-safe pieces with shifts/masks and fold. Bit-exact vs the
    reference engine (verified against a Python big-int model in
    tests/test_rng.py).
    """
    x = state.astype(jnp.uint32)
    xh = x >> 16
    xl = x & jnp.uint32(0xFFFF)
    a = xh * jnp.uint32(_LCG_A)  # < 2^31 (xh < 2^15)
    b = xl * jnp.uint32(_LCG_A)  # < 2^32
    # full = a*2^16 + b; fold modulo M using 2^31 == 1 (mod M)
    s = (
        (a >> 15)
        + ((a & jnp.uint32(0x7FFF)) << 16)
        + (b >> 31)
        + (b & jnp.uint32(0x7FFFFFFF))
    )
    s = (s >> 31) + (s & jnp.uint32(0x7FFFFFFF))
    s = jnp.where(s >= jnp.uint32(_LCG_M), s - jnp.uint32(_LCG_M), s)
    return s.astype(jnp.int32)


def lcg_uniform(state: jnp.ndarray) -> jnp.ndarray:
    """Map state in [1, m-1] to U[0,1) float32."""
    return (state.astype(jnp.float32) - 1.0) * jnp.float32(1.0 / (_LCG_M - 1))


# --- stratified / low-discrepancy hemisphere sampling ------------------
# "Better hemisphere sampling" (INSTRUCTION.md:122): the plain sampler
# hands the cosine-hemisphere warp an independent U^2 point per
# (iter, pixel, depth); here the per-iteration sequence is the R2
# low-discrepancy lattice (the 2D generalization of the golden-ratio
# sequence: x_n = n * (1/p, 1/p^2) mod 1 with p the plastic constant),
# Cranley-Patterson-rotated by a per-(pixel, depth) hash.
#
# PADDED QMC: callers apply the lattice at depth 0 ONLY and keep
# independent LCG draws for deeper bounces. Using the same lattice
# increments at several depths makes the joint sample set across
# iterations degenerate (u_d1 - u_d0 constant per pixel — the rotation
# shifts but never breaks the lockstep), which measurably *increased*
# per-pixel error when tried. Depth 0 is where QMC pays anyway: the
# camera ray is deterministic per pixel, so (u1,u2) integrates a FIXED
# BRDF integrand across iterations; deeper integrands change with the
# upstream path and stratification buys ~nothing.
#
# Everything is exact integer math: a Weyl sequence in uint32 (adding
# round(alpha * 2^32) with natural wraparound) has none of the float32
# frac(alpha * n) precision decay at large n.
_R2_A1 = 3242174889  # round(2^32 / p),  p = 1.32471795724474602596...
_R2_A2 = 2447445414  # round(2^32 / p^2)


def u32_to_unit_float(x: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> [0,1) float32 using the top 24 bits (full mantissa)."""
    return (x >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def stratified_pair(iter_, index: jnp.ndarray, depth):
    """Randomized-QMC (u1,u2) for the hemisphere/BSDF domain at this
    (iteration, pixel, depth). Drop-in for the first two `uniforms`."""
    it_u = jnp.asarray(iter_, jnp.uint32)
    d_u = jnp.asarray(depth, jnp.uint32)
    idx = jnp.asarray(index, jnp.uint32)
    rot1 = utilhash(idx ^ utilhash((d_u << 8) | jnp.uint32(1)))
    rot2 = utilhash(idx ^ utilhash((d_u << 8) | jnp.uint32(2)))
    u1 = u32_to_unit_float(it_u * jnp.uint32(_R2_A1) + rot1)
    u2 = u32_to_unit_float(it_u * jnp.uint32(_R2_A2) + rot2)
    return u1, u2


# --- Owen-scrambled Sobol (the second low-discrepancy sampler) --------
# (0,2)-sequence alternative to the R2 lattice: dimension 1 is the
# van der Corput radical inverse (bit reversal), dimension 2 the
# degree-1 Joe-Kuo direction numbers (m_k = m_{k-1} XOR 2 m_{k-1} ->
# 1,3,5,15,17,...), giving the elementary-interval property the
# lattice lacks (every 2^k x 2^k stratum of the first 4^k iterations
# holds exactly one point — tests/test_sampling.py). Per-pixel
# decorrelation is a nested-uniform OWEN scramble (the hash-based
# formulation from Burley, "Practical Hash-based Owen Scrambling",
# JCGT 2020): scrambling in reversed-bit space preserves the
# elementary intervals, unlike the Cranley-Patterson rotation, so the
# stratification survives the randomization. Same PADDED-QMC contract
# as the lattice: depth 0 only (see the R2 note above). All exact
# integer math; the kernel twin is megakernel._sobol_pair.
def _sobol2_table():
    m = [1]
    for _ in range(31):
        m.append(m[-1] ^ (2 * m[-1]))
    return tuple(
        (mk << (32 - k - 1)) & 0xFFFFFFFF for k, mk in enumerate(m)
    )


_SOBOL_V2 = _sobol2_table()


def _reverse_bits_u32(x):
    x = ((x & jnp.uint32(0x55555555)) << 1) | (
        (x >> 1) & jnp.uint32(0x55555555)
    )
    x = ((x & jnp.uint32(0x33333333)) << 2) | (
        (x >> 2) & jnp.uint32(0x33333333)
    )
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | (
        (x >> 4) & jnp.uint32(0x0F0F0F0F)
    )
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | (
        (x >> 8) & jnp.uint32(0x00FF00FF)
    )
    return (x << 16) | (x >> 16)


def _owen_hash_u32(x, seed):
    """Laine-Karras-style nested uniform scramble of reversed-bit x."""
    x = x + seed
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def _sobol2_u32(n):
    """Second-dimension Sobol integer via the direction-number XOR."""
    r = jnp.zeros_like(n)
    for k, v in enumerate(_SOBOL_V2):
        r = jnp.where((n >> k) & jnp.uint32(1) > 0,
                      r ^ jnp.uint32(v), r)
    return r


def sobol_pair(iter_, index: jnp.ndarray, depth):
    """Owen-scrambled Sobol (u1,u2) at this (iteration, pixel, depth).
    Drop-in for stratified_pair (the --sobol sampler).

    Production iterations are 1-BASED (the render loop and the
    sharded driver both trace iteration ids starting at 1), so the
    sample index is iter-1 — otherwise the first 4^k RENDERED samples
    would be Sobol indices 1..4^k, a misaligned block that breaks the
    elementary-interval property the sequence exists for."""
    it_u = jnp.asarray(iter_, jnp.uint32) - jnp.uint32(1)
    d_u = jnp.asarray(depth, jnp.uint32)
    idx = jnp.asarray(index, jnp.uint32)
    s_idx = utilhash(idx ^ utilhash((d_u << 8) | jnp.uint32(3)))
    s1 = utilhash(idx ^ utilhash((d_u << 8) | jnp.uint32(1)))
    s2 = utilhash(idx ^ utilhash((d_u << 8) | jnp.uint32(2)))
    # Owen-scramble the INDEX too (shuffles sample order per pixel —
    # breaks inter-pixel correlation of the shared iteration counter)
    n = _reverse_bits_u32(_owen_hash_u32(_reverse_bits_u32(it_u), s_idx))
    x1 = _reverse_bits_u32(n)  # dim 1: van der Corput
    x2 = _sobol2_u32(n)
    u1 = u32_to_unit_float(_reverse_bits_u32(_owen_hash_u32(
        _reverse_bits_u32(x1), s1
    )))
    u2 = u32_to_unit_float(_reverse_bits_u32(_owen_hash_u32(
        _reverse_bits_u32(x2), s2
    )))
    return u1, u2


def uniforms(iter_, index: jnp.ndarray, depth, n: int):
    """Draw `n` sequential U(0,1) floats per lane: tuple of n (P,) arrays
    (kept as separate dense rank-1 arrays — the TPU layout rule of
    ops/vec.py).

    Mirrors consuming n draws from one seeded engine per path per bounce.
    """
    state = make_seeded_state(iter_, index, depth)
    outs = []
    for _ in range(n):
        state = lcg_next(state)
        outs.append(lcg_uniform(state))
    return tuple(outs)
