"""Scene parser + data model tests (SURVEY.md §4: parser golden dumps)."""

import numpy as np
import pytest

from project3_cuda_path_tracer_tpu.models.scene import (
    GeomType,
    SceneParseError,
    derive_camera,
    load_scene,
)
from project3_cuda_path_tracer_tpu.utils.math3d import (
    build_transformation_matrix,
    inverse,
    inverse_transpose,
)


class TestCornellParse:
    def test_counts(self, cornell_scene):
        assert cornell_scene.geoms.count == 7
        assert cornell_scene.materials.count == 5

    def test_state(self, cornell_scene):
        s = cornell_scene.state
        assert s.camera.resolution == (800, 800)
        assert s.iterations == 5000
        assert s.trace_depth == 8
        assert s.image_name == "cornell"

    def test_materials(self, cornell_scene):
        m = cornell_scene.materials
        # light: white, emittance 5 (scenes/cornell.txt MATERIAL 0)
        np.testing.assert_allclose(m.color[0], [1, 1, 1])
        assert m.emittance[0] == 5.0
        # diffuse red (MATERIAL 2)
        np.testing.assert_allclose(m.color[2], [0.85, 0.35, 0.35])
        # mirror (MATERIAL 4): REFL 1, SPECRGB .98
        assert m.has_reflective[4] == 1.0
        np.testing.assert_allclose(m.specular_color[4], [0.98, 0.98, 0.98])

    def test_geom_types(self, cornell_scene):
        g = cornell_scene.geoms
        assert list(g.gtype[:6]) == [int(GeomType.CUBE)] * 6
        assert g.gtype[6] == int(GeomType.SPHERE)
        assert list(g.material_id) == [0, 1, 1, 1, 2, 3, 4]

    def test_transform_roundtrip(self, cornell_scene):
        g = cornell_scene.geoms
        for i in range(g.count):
            np.testing.assert_allclose(
                g.transform[i] @ g.inverse_transform[i], np.eye(4), atol=1e-4
            )

    def test_sphere_transform(self, cornell_scene):
        # OBJECT 6: TRANS -1 4 -1, SCALE 3 3 3 (no rotation)
        t = cornell_scene.geoms.transform[6]
        np.testing.assert_allclose(t[:3, 3], [-1, 4, -1], atol=1e-6)
        np.testing.assert_allclose(np.diag(t)[:3], [3, 3, 3], atol=1e-6)


class TestCameraDerivation:
    def test_cornell_camera(self, cornell_scene):
        """Values per the derivation at reference src/scene.cpp:133-142
        with fovy=45, res 800x800, EYE (0,5,10.5), LOOKAT (0,5,0)."""
        cam = cornell_scene.state.camera
        yscaled = np.tan(np.deg2rad(45.0))
        np.testing.assert_allclose(
            cam.pixel_length, [2 * yscaled / 800, 2 * yscaled / 800], rtol=1e-5
        )
        np.testing.assert_allclose(cam.view, [0, 0, -1], atol=1e-6)
        # right = normalize(cross(view, up)) = cross((0,0,-1),(0,1,0)) = +x
        np.testing.assert_allclose(cam.right, [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(cam.up, [0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(cam.fov[1], 45.0)
        np.testing.assert_allclose(
            cam.fov[0], np.degrees(np.arctan(yscaled)), rtol=1e-5
        )

    def test_right_is_view_cross_up(self):
        """The fixed derivation: right from the REAL view vector (the
        reference computes right from uninitialized view at
        src/scene.cpp:138; its runtime recomputes before rendering)."""
        cam = derive_camera((100, 50), [3, 2, 1], [0, 0, 0], [0, 1, 0], 30.0)
        v = np.array([0, 0, 0]) - np.array([3, 2, 1])
        v = v / np.linalg.norm(v)
        np.testing.assert_allclose(cam.view, v, atol=1e-6)
        r = np.cross(v, [0, 1, 0])
        r /= np.linalg.norm(r)
        np.testing.assert_allclose(cam.right, r, atol=1e-6)
        # orthonormal basis
        assert abs(np.dot(cam.view, cam.up)) < 1e-6
        assert abs(np.dot(cam.view, cam.right)) < 1e-6


class TestTransformBuilder:
    def test_trs_order(self):
        """T * Rx * Ry * Rz * S per reference src/utilities.cpp:65-72."""
        m = build_transformation_matrix([1, 2, 3], [0, 0, 0], [2, 2, 2])
        np.testing.assert_allclose(m[:3, 3], [1, 2, 3])
        np.testing.assert_allclose(np.diag(m)[:3], [2, 2, 2])

    def test_rotation_degrees(self):
        # 90 deg about z maps +x to +y
        m = build_transformation_matrix([0, 0, 0], [0, 0, 90], [1, 1, 1])
        v = m[:3, :3] @ np.array([1, 0, 0])
        np.testing.assert_allclose(v, [0, 1, 0], atol=1e-6)

    def test_rotation_composition_order(self):
        # Rx then Ry then Rz applied right-to-left on column vectors:
        # M = Rx @ Ry @ Rz, so Rz acts first.
        m = build_transformation_matrix([0, 0, 0], [90, 0, 90], [1, 1, 1])
        # +x -(Rz 90)-> +y -(Rx 90)-> +z
        v = m[:3, :3] @ np.array([1.0, 0, 0])
        np.testing.assert_allclose(v, [0, 0, 1], atol=1e-6)

    def test_inverse_transpose(self):
        m = build_transformation_matrix([1, 0, 0], [10, 20, 30], [1, 2, 3])
        it = inverse_transpose(m)
        np.testing.assert_allclose(it, np.linalg.inv(m).T, atol=1e-5)
        np.testing.assert_allclose(inverse(m), np.linalg.inv(m), atol=1e-5)


class TestParseErrors:
    def test_sequential_material_ids(self, tmp_path):
        bad = tmp_path / "bad.txt"
        bad.write_text("MATERIAL 1\nRGB 1 1 1\n")
        with pytest.raises(SceneParseError):
            load_scene(str(bad))

    def test_no_camera(self, tmp_path):
        bad = tmp_path / "nocam.txt"
        bad.write_text("MATERIAL 0\nRGB 1 1 1\nSPECEX 0\nSPECRGB 0 0 0\n"
                       "REFL 0\nREFR 0\nREFRIOR 0\nEMITTANCE 0\n")
        with pytest.raises(SceneParseError):
            load_scene(str(bad))

    def test_crlf_tolerant(self, tmp_path, cornell_scene):
        import os

        src = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scenes",
            "cornell.txt",
        )
        with open(src, "rb") as f:
            data = f.read().replace(b"\n", b"\r\n")
        crlf = tmp_path / "crlf.txt"
        crlf.write_bytes(data)
        s = load_scene(str(crlf))
        assert s.geoms.count == cornell_scene.geoms.count
        np.testing.assert_allclose(
            s.geoms.transform, cornell_scene.geoms.transform
        )
