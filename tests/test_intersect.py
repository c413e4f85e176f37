"""Intersection math vs closed-form cases (SURVEY.md §4: same-t as the
reference's formulas at src/intersections.h:48-144)."""

import numpy as np
import jax.numpy as jnp

from project3_cuda_path_tracer_tpu.ops.intersect import (
    box_intersect,
    sphere_intersect,
    triangle_intersect,
)
from project3_cuda_path_tracer_tpu.ops.vec import Vec3
from project3_cuda_path_tracer_tpu.utils.math3d import (
    build_transformation_matrix,
    inverse,
    inverse_transpose,
)


def mats(trans, rot, scale):
    m = build_transformation_matrix(trans, rot, scale)
    return (
        jnp.asarray(m),
        jnp.asarray(inverse(m)),
        jnp.asarray(inverse_transpose(m)),
    )


def ray(o, d):
    d = np.asarray(d, np.float32)
    d = d / np.linalg.norm(d)
    o = np.asarray(o, np.float32)
    return (
        Vec3.from_array(jnp.asarray(o[None])),
        Vec3.from_array(jnp.asarray(d[None])),
    )


def arr(v: Vec3):
    return np.asarray(v.to_array())


class TestSphere:
    def test_head_on(self):
        """Unit-diameter sphere at origin, ray from z=+5 along -z:
        hits at z=0.5, t = 4.5 (minus the 1e-4 backoff)."""
        xf, inv, it = mats([0, 0, 0], [0, 0, 0], [1, 1, 1])
        o, d = ray([0, 0, 5], [0, 0, -1])
        t, n, outside = sphere_intersect(xf, inv, it, o, d)
        np.testing.assert_allclose(t[0], 4.5, atol=1e-3)
        np.testing.assert_allclose(arr(n)[0], [0, 0, 1], atol=1e-4)
        assert bool(outside[0])

    def test_from_inside(self):
        """Ray from center exits at 0.5 with flipped normal."""
        xf, inv, it = mats([0, 0, 0], [0, 0, 0], [1, 1, 1])
        o, d = ray([0, 0, 0], [0, 0, -1])
        t, n, outside = sphere_intersect(xf, inv, it, o, d)
        np.testing.assert_allclose(t[0], 0.5, atol=1e-3)
        assert not bool(outside[0])
        # normal flipped toward ray origin side
        np.testing.assert_allclose(arr(n)[0], [0, 0, 1], atol=1e-4)

    def test_miss(self):
        xf, inv, it = mats([0, 0, 0], [0, 0, 0], [1, 1, 1])
        o, d = ray([0, 2, 5], [0, 0, -1])
        t, n, outside = sphere_intersect(xf, inv, it, o, d)
        assert t[0] == -1.0

    def test_scaled_translated(self):
        """Cornell sphere: TRANS -1 4 -1 SCALE 3 3 3 -> radius 1.5."""
        xf, inv, it = mats([-1, 4, -1], [0, 0, 0], [3, 3, 3])
        o, d = ray([-1, 4, 10], [0, 0, -1])
        t, n, outside = sphere_intersect(xf, inv, it, o, d)
        np.testing.assert_allclose(t[0], 11 - 1.5, atol=1e-2)
        np.testing.assert_allclose(arr(n)[0], [0, 0, 1], atol=1e-4)

    def test_behind(self):
        xf, inv, it = mats([0, 0, 0], [0, 0, 0], [1, 1, 1])
        o, d = ray([0, 0, 5], [0, 0, 1])  # sphere is behind
        t, *_ = sphere_intersect(xf, inv, it, o, d)
        assert t[0] == -1.0


class TestBox:
    def test_head_on(self):
        xf, inv, it = mats([0, 0, 0], [0, 0, 0], [1, 1, 1])
        o, d = ray([0, 0, 5], [0, 0, -1])
        t, n, outside = box_intersect(xf, inv, o, d)
        np.testing.assert_allclose(t[0], 4.5, atol=1e-3)
        np.testing.assert_allclose(arr(n)[0], [0, 0, 1], atol=1e-5)
        assert bool(outside[0])

    def test_inside(self):
        xf, inv, it = mats([0, 0, 0], [0, 0, 0], [1, 1, 1])
        o, d = ray([0, 0, 0], [1, 0, 0])
        t, n, outside = box_intersect(xf, inv, o, d)
        np.testing.assert_allclose(t[0], 0.5, atol=1e-3)
        assert not bool(outside[0])
        # slab-sign rule (src/intersections.h:66): n[xyz] = t2<t1 ? +1 : -1,
        # so the exit-face normal points BACK toward the ray origin (-x here)
        np.testing.assert_allclose(arr(n)[0], [-1, 0, 0], atol=1e-5)

    def test_thin_wall(self):
        """Cornell wall: SCALE .01 10 10 at x=-5; ray from origin along -x
        hits inner face x=-4.995 -> t = 4.995."""
        xf, inv, it = mats([-5, 5, 0], [0, 0, 0], [0.01, 10, 10])
        o, d = ray([0, 5, 0], [-1, 0, 0])
        t, n, outside = box_intersect(xf, inv, o, d)
        np.testing.assert_allclose(t[0], 4.995, atol=1e-3)
        np.testing.assert_allclose(arr(n)[0], [1, 0, 0], atol=1e-4)

    def test_rotated(self):
        """45deg-rotated unit cube: ray along -z hits the edge-on corner
        at z = sqrt(2)/2."""
        xf, inv, it = mats([0, 0, 0], [0, 45, 0], [1, 1, 1])
        o, d = ray([0, 0, 5], [0, 0, -1])
        t, n, outside = box_intersect(xf, inv, o, d)
        np.testing.assert_allclose(t[0], 5 - np.sqrt(2) / 2, atol=1e-2)

    def test_axis_parallel_offset_miss(self):
        xf, inv, it = mats([0, 0, 0], [0, 0, 0], [1, 1, 1])
        o, d = ray([0, 2, 5], [0, 0, -1])  # passes above
        t, *_ = box_intersect(xf, inv, o, d)
        assert t[0] == -1.0

    def test_grazing_parallel_ray(self):
        """Ray parallel to a slab (dir component exactly 0) outside it:
        IEEE inf semantics must still yield a miss."""
        xf, inv, it = mats([0, 0, 0], [0, 0, 0], [1, 1, 1])
        o, d = ray([0, 0.7, 5], [0, 0, -1])
        t, *_ = box_intersect(xf, inv, o, d)
        assert t[0] == -1.0


class TestTriangle:
    def _tri(self):
        return (
            Vec3.from_array(jnp.asarray([[0.0, 0, 0]])),
            Vec3.from_array(jnp.asarray([[1.0, 0, 0]])),
            Vec3.from_array(jnp.asarray([[0.0, 1, 0]])),
        )

    def test_hit_and_barycentrics(self):
        v0, v1, v2 = self._tri()
        o, d = ray([0.25, 0.25, 3], [0, 0, -1])
        t, u, v, valid = triangle_intersect(v0, v1, v2, o, d)
        assert bool(valid[0])
        np.testing.assert_allclose(t[0], 3.0, atol=1e-4)
        np.testing.assert_allclose([u[0], v[0]], [0.25, 0.25], atol=1e-5)

    def test_outside_miss(self):
        v0, v1, v2 = self._tri()
        o, d = ray([0.9, 0.9, 3], [0, 0, -1])  # outside hypotenuse
        t, u, v, valid = triangle_intersect(v0, v1, v2, o, d)
        assert not bool(valid[0])
        assert t[0] > 1e30  # FLT_MAX sentinel

    def test_parallel_miss(self):
        v0, v1, v2 = self._tri()
        o, d = ray([0, 0, 1], [1, 0, 0])
        t, u, v, valid = triangle_intersect(v0, v1, v2, o, d)
        assert not bool(valid[0])


class TestSceneSweep:
    def test_cornell_primary_hits(self, cornell_scene):
        """The exact center ray grazes the mirror sphere (center offset
        sqrt(2) < radius 1.5) at t = 11.5 - sqrt(1.5^2-2) = 11.0; a ray
        aimed right of the sphere reaches the back wall (mat 1)."""
        from project3_cuda_path_tracer_tpu.models.device import scene_to_device
        from project3_cuda_path_tracer_tpu.ops.sweep import intersect_scene

        ds = scene_to_device(cornell_scene, use_bvh=False)
        o = Vec3.from_array(jnp.asarray([[0, 5, 10.5], [0, 5, 10.5]], jnp.float32))
        to_wall = np.array([3.0, 0.0, -15.5])
        to_wall = to_wall / np.linalg.norm(to_wall)
        d = Vec3.from_array(
            jnp.asarray([[0, 0, -1], to_wall.tolist()], jnp.float32)
        )
        isect = intersect_scene(o, d, ds, use_bvh=False)
        np.testing.assert_allclose(
            isect.t[0], 11.5 - np.sqrt(1.5**2 - 2.0), atol=1e-2
        )
        assert int(isect.material_id[0]) == 4
        # back wall inner face at z=-4.995, 15.495 along -z, scaled by 1/cos
        expect = 15.495 * np.linalg.norm([3.0, 0, -15.5]) / 15.5
        np.testing.assert_allclose(isect.t[1], expect, atol=2e-2)
        assert int(isect.material_id[1]) == 1
