"""BSDF sampling tests: hemisphere statistics, reflect/refract identities,
Schlick values (SURVEY.md §4: statistical tests on the sampler)."""

import numpy as np
import jax.numpy as jnp

from project3_cuda_path_tracer_tpu.ops import rng
from project3_cuda_path_tracer_tpu.ops.bsdf import (
    cosine_hemisphere,
    reflect,
    refract,
    schlick,
)
from project3_cuda_path_tracer_tpu.ops.vec import Vec3


def vec_of(arr):
    """(N,3) numpy -> Vec3 lanes."""
    a = jnp.asarray(arr, jnp.float32)
    return Vec3.from_array(a)


class TestCosineHemisphere:
    def _draws(self, n=50000):
        u = rng.uniforms(jnp.int32(11), jnp.arange(n, dtype=jnp.int32), 0, 2)
        return u[0], u[1]

    def test_statistics_z_up(self):
        """Cosine-weighted: E[cos theta]=2/3, all samples in upper
        hemisphere, unit length (src/interactions.h:10-42 sampler)."""
        u1, u2 = self._draws()
        n = vec_of(np.tile([[0.0, 0.0, 1.0]], (u1.shape[0], 1)))
        d = np.asarray(cosine_hemisphere(n, u1, u2).to_array())
        assert (d[:, 2] > 0).all()
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
        np.testing.assert_allclose(d[:, 2].mean(), 2 / 3, atol=0.01)
        # azimuthal symmetry
        np.testing.assert_allclose(d[:, 0].mean(), 0.0, atol=0.01)
        np.testing.assert_allclose(d[:, 1].mean(), 0.0, atol=0.01)

    def test_arbitrary_normals(self):
        """Sampler must stay in the hemisphere for every normal direction,
        including the diagonal where the not-normal-axis trick switches."""
        u1, u2 = self._draws(10000)
        for nvec in [
            [1, 0, 0],
            [0, -1, 0],
            [0.577, 0.577, 0.578],
            [-0.707, 0.707, 0],
        ]:
            nv = np.asarray(nvec, np.float32)
            nv /= np.linalg.norm(nv)
            n = vec_of(np.tile(nv[None], (u1.shape[0], 1)))
            d = np.asarray(cosine_hemisphere(n, u1, u2).to_array())
            cos = d @ nv
            assert (cos > -1e-4).all()
            np.testing.assert_allclose(cos.mean(), 2 / 3, atol=0.02)


class TestReflectRefract:
    def test_reflect_mirror(self):
        d = vec_of([[0.6, -0.8, 0.0]])
        n = vec_of([[0.0, 1.0, 0.0]])
        r = np.asarray(reflect(d, n).to_array())
        np.testing.assert_allclose(r[0], [0.6, 0.8, 0.0], atol=1e-6)

    def test_refract_straight_through(self):
        d = vec_of([[0.0, -1.0, 0.0]])
        n = vec_of([[0.0, 1.0, 0.0]])
        r, tir = refract(d, n, jnp.asarray([1.0 / 1.5]))
        assert not bool(tir[0])
        np.testing.assert_allclose(
            np.asarray(r.to_array())[0], [0, -1, 0], atol=1e-6
        )

    def test_snell_angle(self):
        """45 deg incidence air->glass (ior 1.5): sin(theta_t)=sin(45)/1.5."""
        s = np.sqrt(0.5)
        d = vec_of([[s, -s, 0.0]])
        n = vec_of([[0.0, 1.0, 0.0]])
        r, tir = refract(d, n, jnp.asarray([1.0 / 1.5]))
        r = np.asarray(r.to_array())[0]
        r = r / np.linalg.norm(r)
        sin_t = abs(r[0])
        np.testing.assert_allclose(sin_t, s / 1.5, atol=1e-6)

    def test_total_internal_reflection(self):
        """Glass->air beyond the critical angle (41.8 deg for ior 1.5)."""
        a = np.deg2rad(60)
        d = vec_of([[np.sin(a), -np.cos(a), 0.0]])
        n = vec_of([[0.0, 1.0, 0.0]])
        r, tir = refract(d, n, jnp.asarray([1.5]))
        assert bool(tir[0])

    def test_schlick_limits(self):
        # normal incidence on glass: R0 = ((1-1.5)/(2.5))^2 = 0.04
        r = float(schlick(jnp.asarray([1.0]), jnp.asarray([1.5]))[0])
        np.testing.assert_allclose(r, 0.04, atol=1e-6)
        # grazing incidence -> 1
        r = float(schlick(jnp.asarray([0.0]), jnp.asarray([1.5]))[0])
        np.testing.assert_allclose(r, 1.0, atol=1e-6)
