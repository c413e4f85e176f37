"""Mesh UV texture-mapping tests (INSTRUCTION.md:114-116; VERDICT r1 #1
missing item): OBJ vt parsing, barycentric UV interpolation at
intersection, UV-based texture sampling, BVH/naive agreement."""

import os

import numpy as np
import pytest

from tests.conftest import SCENES


@pytest.fixture(scope="module")
def uv_scene():
    from project3_cuda_path_tracer_tpu.models.scene import load_scene

    return load_scene(os.path.join(SCENES, "mesh_textured.txt"))


def quad_rays(xs, ys, z0=5.0):
    """Rays at world (x, y, z0) pointing -z toward the quad at z=-2."""
    import jax.numpy as jnp

    from project3_cuda_path_tracer_tpu.ops.vec import Vec3

    n = len(xs)
    origins = Vec3(
        jnp.asarray(xs, jnp.float32),
        jnp.asarray(ys, jnp.float32),
        jnp.full((n,), z0, jnp.float32),
    )
    dirs = Vec3(
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.full((n,), -1.0, jnp.float32),
    )
    return origins, dirs


class TestObjParsing:
    def test_vt_records_parsed(self):
        from project3_cuda_path_tracer_tpu.models.mesh import load_obj

        tris = load_obj(os.path.join(SCENES, "assets", "uv_quad.obj"))
        assert tris.count == 2
        assert tris.has_uv
        # face 1: corners (v1,v2,v3) with vt (0,0),(1,0),(1,1)
        np.testing.assert_allclose(tris.uv0[0], [0, 0])
        np.testing.assert_allclose(tris.uv1[0], [1, 0])
        np.testing.assert_allclose(tris.uv2[0], [1, 1])

    def test_mesh_without_vt_has_no_uv(self):
        from project3_cuda_path_tracer_tpu.models.mesh import load_obj

        tris = load_obj(os.path.join(SCENES, "assets", "icosphere.obj"))
        assert not tris.has_uv

    def test_scene_flags(self, uv_scene):
        assert bool(uv_scene.geoms.has_uv[6])
        assert not bool(uv_scene.geoms.has_uv[0])


class TestUVInterpolation:
    # Quad instance: TRANS 0 5 -2, SCALE 6 6 1 -> world x in [-3,3],
    # y in [2,8], z=-2; u=(x+3)/6, v=(y-2)/6.

    @pytest.mark.parametrize("use_bvh", [False, True])
    def test_interpolated_uv_matches_closed_form(self, uv_scene, use_bvh):
        from project3_cuda_path_tracer_tpu.models.device import scene_to_device
        from project3_cuda_path_tracer_tpu.ops.sweep import intersect_scene

        dev = scene_to_device(uv_scene, use_bvh=use_bvh)
        xs = [-2.7, -1.5, 0.0, 0.9, 2.4]
        ys = [2.6, 4.0, 5.0, 6.7, 7.3]
        origins, dirs = quad_rays(xs, ys)
        isect = intersect_scene(origins, dirs, dev, use_bvh=use_bvh)
        assert bool(np.asarray(isect.has_uv).all())
        want_u = (np.asarray(xs) + 3.0) / 6.0
        want_v = (np.asarray(ys) - 2.0) / 6.0
        np.testing.assert_allclose(np.asarray(isect.tex_u), want_u, atol=1e-4)
        np.testing.assert_allclose(np.asarray(isect.tex_v), want_v, atol=1e-4)

    def test_wall_lanes_have_no_uv(self, uv_scene):
        from project3_cuda_path_tracer_tpu.models.device import scene_to_device
        from project3_cuda_path_tracer_tpu.ops.sweep import intersect_scene

        dev = scene_to_device(uv_scene, use_bvh=False)
        # x=4.5 misses the quad (half-width 3) and hits the back wall
        origins, dirs = quad_rays([4.5], [5.0])
        isect = intersect_scene(origins, dirs, dev, use_bvh=False)
        assert float(np.asarray(isect.t)[0]) > 0
        assert not bool(np.asarray(isect.has_uv)[0])


class TestUVTextureSampling:
    def test_color_sampled_by_mesh_uv(self, uv_scene):
        """The sampled albedo must be the (bilinear) texture fetch at
        the OBJ chart's (u, 1-v) — not the box projection. Compared
        against a numpy bilinear closed form."""
        import jax.numpy as jnp

        from project3_cuda_path_tracer_tpu.models.device import scene_to_device
        from project3_cuda_path_tracer_tpu.ops.sweep import intersect_scene
        from project3_cuda_path_tracer_tpu.ops.texture import (
            TEX_RES,
            apply_textures,
        )
        from project3_cuda_path_tracer_tpu.ops.vec import Vec3

        dev = scene_to_device(uv_scene, use_bvh=False)
        xs = [-2.1, 0.3, 1.8]
        ys = [3.1, 5.2, 6.9]
        origins, dirs = quad_rays(xs, ys)
        isect = intersect_scene(origins, dirs, dev, use_bvh=False)

        base = Vec3(
            jnp.full((3,), 0.95), jnp.full((3,), 0.95), jnp.full((3,), 0.95)
        )
        p_hit = origins + dirs * (isect.t - 1e-4)
        color, _ = apply_textures(
            dev, p_hit, isect.normal, isect.material_id, base,
            tex_u=isect.tex_u, tex_v=isect.tex_v, has_uv=isect.has_uv,
        )

        u = (np.asarray(xs) + 3.0) / 6.0
        v = 1.0 - (np.asarray(ys) - 2.0) / 6.0  # OBJ v is bottom-up
        tex = uv_scene.textures[0]  # (R,R,3) resampled atlas

        def bilinear(tex, u, v):
            fx, fy = u * TEX_RES - 0.5, v * TEX_RES - 0.5
            x0, y0 = np.floor(fx).astype(int), np.floor(fy).astype(int)
            wx, wy = fx - x0, fy - y0
            x0m, y0m = x0 % TEX_RES, y0 % TEX_RES
            x1m, y1m = (x0 + 1) % TEX_RES, (y0 + 1) % TEX_RES
            c00 = tex[y0m, x0m]
            c01 = tex[y0m, x1m]
            c10 = tex[y1m, x0m]
            c11 = tex[y1m, x1m]
            top = c00 * (1 - wx)[:, None] + c01 * wx[:, None]
            bot = c10 * (1 - wx)[:, None] + c11 * wx[:, None]
            return top * (1 - wy)[:, None] + bot * wy[:, None]

        want = 0.95 * bilinear(tex, u, v)
        got = np.stack(
            [np.asarray(color.x), np.asarray(color.y), np.asarray(color.z)],
            axis=-1,
        )
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_uv_render_end_to_end(self, uv_scene):
        import copy

        from project3_cuda_path_tracer_tpu.models.scene import derive_camera
        from project3_cuda_path_tracer_tpu.render import (
            Renderer,
            RenderSettings,
        )

        s = copy.copy(uv_scene)
        s.state = copy.copy(uv_scene.state)
        cam = uv_scene.state.camera
        s.state.camera = derive_camera(
            (48, 48), cam.position, cam.look_at,
            np.array([0, 1, 0], np.float32), float(cam.fov[1]),
        )
        r = Renderer(s, RenderSettings(trace_depth=4))
        r.step_batch(12)
        img = r.image() / 12
        assert np.isfinite(img).all() and img.max() > 0.5


class TestNativeLoader:
    def test_native_matches_python(self):
        """csrc/obj_loader.cpp must produce a bit-identical TriangleSoup
        to the pure-Python parser (same fan triangulation, normal
        fallback, uv semantics). ~47x faster on a 51k-tri mesh."""
        from project3_cuda_path_tracer_tpu.models.mesh import (
            _load_obj_native,
            _load_obj_python,
        )

        for name in ("uv_quad.obj", "knot.obj"):
            path = os.path.join(SCENES, "assets", name)
            a = _load_obj_native(path)
            if a is None:
                pytest.skip("native toolchain unavailable")
            b = _load_obj_python(path)
            assert a.count == b.count
            assert a.has_uv == b.has_uv
            for f in ("v0", "v1", "v2", "n0", "n1", "n2",
                      "uv0", "uv1", "uv2"):
                np.testing.assert_array_equal(
                    getattr(a, f), getattr(b, f), err_msg=f"{name}:{f}"
                )


class TestMixedVtFaces:
    """A mesh where only SOME faces carry vt must fall back to
    box-projection for the WHOLE mesh (has_uv is consumed per-geom, so
    partial vt would make vt-less faces sample texel (0,0) — round-2
    advisor finding). Both loaders must agree."""

    OBJ = """v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
f 1/1 2/2 3/3
f 1 3 4
"""

    def _write(self, tmp_path):
        p = tmp_path / "mixed.obj"
        p.write_text(self.OBJ)
        return str(p)

    def test_python_loader_demotes(self, tmp_path):
        from project3_cuda_path_tracer_tpu.models.mesh import load_obj

        tris = load_obj(self._write(tmp_path), prefer_native=False)
        assert tris.count == 2
        assert not tris.has_uv

    def test_native_loader_demotes(self, tmp_path):
        from project3_cuda_path_tracer_tpu.models.mesh import (
            _load_obj_native,
        )

        soup = _load_obj_native(self._write(tmp_path))
        if soup is None:
            import pytest

            pytest.skip("native loader unavailable")
        assert soup.count == 2
        assert not soup.has_uv

    def test_all_vt_keeps_uv(self, tmp_path):
        from project3_cuda_path_tracer_tpu.models.mesh import load_obj

        p = tmp_path / "full.obj"
        p.write_text(
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nvt 0 0\nvt 1 0\nvt 1 1\n"
            "f 1/1 2/2 3/3\n"
        )
        tris = load_obj(str(p), prefer_native=False)
        assert tris.has_uv


class TestMeshUvInKernel:
    def test_mesh_textured_rides_pipeline_and_matches_xla(self):
        """mesh_textured.txt (OBJ per-corner UVs + file texture) rides
        the mesh pipeline with the in-kernel atlas fetch: K3 carries
        interpolated UVs through the dense stream, so the fused path
        must match the XLA apply_textures path bit-near-exactly."""
        import numpy as np
        from jax.experimental.pallas import tpu as pltpu

        from project3_cuda_path_tracer_tpu.models.device import (
            scene_to_device,
        )
        from project3_cuda_path_tracer_tpu.models.scene import load_scene
        from project3_cuda_path_tracer_tpu.render import (
            Renderer,
            RenderSettings,
            kernel_plan,
        )
        from tests.conftest import SCENES, make_small_cornell

        scene = make_small_cornell(
            load_scene(os.path.join(SCENES, "mesh_textured.txt")),
            (32, 32),
        )
        settings = RenderSettings(
            trace_depth=3, use_bvh=False, use_pallas=True
        )
        ds = scene_to_device(scene, use_bvh=False)
        plan = kernel_plan(ds, settings)
        assert plan.mesh_pipeline
        rp = Renderer(scene, settings)
        with pltpu.force_tpu_interpret_mode():
            rp.step()
        rx = Renderer(
            scene, RenderSettings(trace_depth=3, use_bvh=False)
        )
        rx.step()
        diff = np.abs(rp.image() - rx.image())
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.02
