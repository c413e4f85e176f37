"""BVH build + stackless traversal tests (INSTRUCTION.md:123-140).

Validates builder invariants, native/numpy builder agreement, and that
BVH traversal is an exact drop-in for the naive triangle sweep."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu.models.bvh import (
    LEAF_SIZE,
    _build_numpy,
    build_mesh_bvh,
)
from project3_cuda_path_tracer_tpu.models.mesh import load_obj
from project3_cuda_path_tracer_tpu.ops.vec import Vec3
from tests.conftest import SCENES

ICOSPHERE = os.path.join(SCENES, "assets", "icosphere.obj")


@pytest.fixture(scope="module")
def icosphere():
    return load_obj(ICOSPHERE)


def validate_bvh(nodes_min, nodes_max, meta, order, T):
    B = meta.shape[0]
    assert order.shape == (T,)
    assert sorted(order.tolist()) == list(range(T))  # permutation
    covered = np.zeros(T, bool)
    for i in range(B):
        first, count, skip, is_leaf = meta[i]
        assert node_valid_skip(skip, i, B)
        if is_leaf:
            assert 1 <= count <= LEAF_SIZE
            assert not covered[first : first + count].any()
            covered[first : first + count] = True
        # AABB sanity
        assert (nodes_min[i] <= nodes_max[i] + 1e-6).all()
    assert covered.all()


def node_valid_skip(skip, i, B):
    return i < skip <= B


class TestBuilderNumpy:
    def test_invariants_icosphere(self, icosphere):
        nm, nx, meta, order = _build_numpy(
            icosphere.v0, icosphere.v1, icosphere.v2
        )
        validate_bvh(nm, nx, meta, order, icosphere.count)

    def test_root_contains_everything(self, icosphere):
        nm, nx, meta, order = _build_numpy(
            icosphere.v0, icosphere.v1, icosphere.v2
        )
        allv = np.concatenate([icosphere.v0, icosphere.v1, icosphere.v2])
        np.testing.assert_array_less(nm[0] - 1e-5, allv.min(axis=0) + 1e-5)
        np.testing.assert_array_less(allv.max(axis=0) - 1e-5, nx[0] + 1e-5)

    def test_leaf_aabbs_contain_their_triangles(self, icosphere):
        nm, nx, meta, order = _build_numpy(
            icosphere.v0, icosphere.v1, icosphere.v2
        )
        v0, v1, v2 = (
            icosphere.v0[order],
            icosphere.v1[order],
            icosphere.v2[order],
        )
        for i in range(meta.shape[0]):
            first, count, skip, is_leaf = meta[i]
            if not is_leaf:
                continue
            for k in range(first, first + count):
                for v in (v0[k], v1[k], v2[k]):
                    assert (v >= nm[i] - 1e-4).all()
                    assert (v <= nx[i] + 1e-4).all()

    def test_tiny_mesh(self):
        v0 = np.array([[0, 0, 0]], np.float32)
        v1 = np.array([[1, 0, 0]], np.float32)
        v2 = np.array([[0, 1, 0]], np.float32)
        nm, nx, meta, order = _build_numpy(v0, v1, v2)
        assert meta.shape[0] == 1
        assert meta[0, 3] == 1  # single leaf


class TestBuilderNative:
    def test_native_available_and_valid(self, icosphere):
        from project3_cuda_path_tracer_tpu.utils.native import load_bvh_builder

        if load_bvh_builder() is None:
            pytest.skip("native toolchain unavailable")
        out = build_mesh_bvh(
            icosphere.v0, icosphere.v1, icosphere.v2, prefer_native=True
        )
        nm, nx, meta, order = out
        validate_bvh(nm, nx, meta, order, icosphere.count)


class TestTraversal:
    def _scene(self, use_bvh):
        from project3_cuda_path_tracer_tpu.models.device import scene_to_device
        from project3_cuda_path_tracer_tpu.models.scene import load_scene

        scene = load_scene(os.path.join(SCENES, "mesh.txt"))
        return scene_to_device(scene, use_bvh=use_bvh)

    def test_bvh_matches_naive(self):
        from project3_cuda_path_tracer_tpu.ops.sweep import intersect_scene

        ds_bvh = self._scene(True)
        ds_naive = self._scene(False)
        assert ds_bvh.bvh_roots[6][1] > 0

        rng = np.random.default_rng(0)
        n = 256
        o = np.tile([[0, 5, 10.5]], (n, 1)).astype(np.float32)
        targets = rng.uniform([-4, 1, -4], [4, 9, 2], (n, 3)).astype(np.float32)
        d = targets - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        ov = Vec3.from_array(jnp.asarray(o))
        dv = Vec3.from_array(jnp.asarray(d))

        ib = intersect_scene(ov, dv, ds_bvh, use_bvh=True)
        inv = intersect_scene(ov, dv, ds_naive, use_bvh=False)
        np.testing.assert_allclose(ib.t, inv.t, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(ib.material_id, inv.material_id)
        np.testing.assert_allclose(
            np.asarray(ib.normal.to_array()),
            np.asarray(inv.normal.to_array()),
            atol=1e-3,
        )

    def test_mesh_render_bvh_neutral(self, cornell_scene):
        """Full render of the mesh scene: BVH on == BVH off, bit-equal."""
        import copy

        from project3_cuda_path_tracer_tpu.models.scene import (
            derive_camera,
            load_scene,
        )
        from project3_cuda_path_tracer_tpu.render import Renderer, RenderSettings

        def small(use_bvh):
            scene = load_scene(os.path.join(SCENES, "mesh.txt"))
            cam = scene.state.camera
            scene.state.camera = derive_camera(
                (24, 24),
                cam.position,
                cam.look_at,
                np.array([0, 1, 0], np.float32),
                float(cam.fov[1]),
            )
            r = Renderer(
                scene, RenderSettings(trace_depth=4, use_bvh=use_bvh)
            )
            for _ in range(2):
                r.step()
            return r.image()

        a = small(True)
        b = small(False)
        np.testing.assert_allclose(a, b, atol=1e-4)
        assert a.max() > 0.5  # light visible
