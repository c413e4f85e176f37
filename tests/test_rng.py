"""RNG fidelity tests: utilhash bit-exactness, minstd LCG stream,
uniformity (SURVEY.md §2 component 8)."""

import numpy as np
import jax.numpy as jnp

from project3_cuda_path_tracer_tpu.ops import rng


def utilhash_py(a: int) -> int:
    """Pure-Python uint32 model of reference src/intersections.h:12-20."""
    M = 0xFFFFFFFF
    a = a & M
    a = ((a + 0x7ED55D16) + (a << 12)) & M
    a = ((a ^ 0xC761C23C) ^ (a >> 19)) & M
    a = ((a + 0x165667B1) + (a << 5)) & M
    a = ((a + 0xD3A2646C) ^ (a << 9)) & M
    a = ((a + 0xFD7046C5) + (a << 3)) & M
    a = ((a ^ 0xB55A4F09) ^ (a >> 16)) & M
    return a


def minstd_py(seed: int, n: int):
    """minstd LCG x <- 48271*x mod (2^31-1), thrust-style seed handling."""
    m = 2147483647
    x = seed % m
    if x == 0:
        x = 1
    out = []
    for _ in range(n):
        x = (48271 * x) % m
        out.append((x - 1) / (m - 1))
    return out


class TestUtilhash:
    def test_bit_exact(self):
        vals = [0, 1, 12345, 0x7FFFFFFF, 0x80000000, 0xFFFFFFFF, 999999937]
        got = np.asarray(rng.utilhash(jnp.asarray(vals, jnp.uint32)))
        want = [utilhash_py(v) for v in vals]
        assert list(got) == want


class TestLCG:
    def test_stream_matches_python_model(self):
        for iter_, idx, depth in [(1, 0, 0), (7, 12345, 3), (4999, 639999, 7)]:
            seed = (
                utilhash_py((1 << 31) | (depth << 22) | iter_)
                ^ utilhash_py(idx)
            )
            want = minstd_py(seed, 5)
            got = np.asarray(
                rng.uniforms(
                    jnp.int32(iter_), jnp.asarray([idx], jnp.int32), depth, 5
                )
            )[:, 0]
            np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_uniformity(self):
        u = np.asarray(
            rng.uniforms(jnp.int32(3), jnp.arange(50000, dtype=jnp.int32), 2, 3)
        )
        assert u.min() >= 0.0 and u.max() < 1.0
        np.testing.assert_allclose(u.mean(axis=1), 0.5, atol=0.01)
        np.testing.assert_allclose(u.std(axis=1), 1 / np.sqrt(12), atol=0.01)

    def test_decorrelated_across_depth_and_iter(self):
        idx = jnp.arange(20000, dtype=jnp.int32)
        a = np.asarray(rng.uniforms(jnp.int32(5), idx, 1, 1))[0]
        b = np.asarray(rng.uniforms(jnp.int32(5), idx, 2, 1))[0]
        c = np.asarray(rng.uniforms(jnp.int32(6), idx, 1, 1))[0]
        # minstd leaves a small residual lane-to-lane correlation (~0.03)
        # between adjacent depth seeds; the reference's engine has the
        # same structure, so only guard against gross correlation here.
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.08
        assert abs(np.corrcoef(a, c)[0, 1]) < 0.08
