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
    state = (h % jnp.uint32(_LCG_M)).astype(jnp.int32)
    return jnp.where(state == 0, jnp.int32(1), state)


def lcg_next(state: jnp.ndarray) -> jnp.ndarray:
    """One minstd step x <- 48271*x mod (2^31-1) via Schrage (int32-safe)."""
    hi = state // _LCG_Q
    lo = state - hi * _LCG_Q
    t = jnp.int32(_LCG_A) * lo - jnp.int32(_LCG_R) * hi
    return jnp.where(t > 0, t, t + jnp.int32(_LCG_M))


def lcg_uniform(state: jnp.ndarray) -> jnp.ndarray:
    """Map state in [1, m-1] to U[0,1) float32."""
    return (state.astype(jnp.float32) - 1.0) * jnp.float32(1.0 / (_LCG_M - 1))


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
