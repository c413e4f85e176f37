"""Feature-level render tests: refraction, Russian roulette, DoF, AA
(INSTRUCTION.md:105-113 features; BASELINE configs 2-3)."""

import os

import numpy as np

from project3_cuda_path_tracer_tpu.models.scene import derive_camera, load_scene
from project3_cuda_path_tracer_tpu.render import Renderer, RenderSettings
from tests.conftest import SCENES


def small(scene_name, res, **cam_kw):
    scene = load_scene(os.path.join(SCENES, scene_name))
    cam = scene.state.camera
    scene.state.camera = derive_camera(
        res,
        cam.position,
        cam.look_at,
        np.array([0, 1, 0], np.float32),
        float(cam.fov[1]),
        cam_kw.get("aperture", cam.aperture),
        cam_kw.get("focal", cam.focal_distance),
    )
    return scene


def render(scene, spp, **kw):
    r = Renderer(scene, RenderSettings(trace_depth=8, use_bvh=False, **kw))
    for _ in range(spp):
        r.step()
    return r


class TestGlass:
    def test_renders_and_transmits(self):
        r = render(small("cornell_glass.txt", (32, 32)), 24)
        img = r.image() / 24
        assert np.isfinite(img).all()
        assert img.max() > 0.5
        # glass sphere center: light passes through, so the region behind
        # the sphere is NOT black (vs a mirror which shows reflections)
        assert img[14:18, 12:18].mean() > 0.02

    def test_specialization_flags(self):
        from project3_cuda_path_tracer_tpu.models.device import scene_to_device

        glass = scene_to_device(small("cornell_glass.txt", (8, 8)), use_bvh=False)
        plain = scene_to_device(small("cornell.txt", (8, 8)), use_bvh=False)
        assert glass.any_refractive and not plain.any_refractive
        assert not glass.any_partial_reflective
        many = scene_to_device(
            small("many_materials.txt", (8, 8)), use_bvh=False
        )
        assert many.any_refractive and many.any_partial_reflective


class TestRussianRoulette:
    def test_kills_paths_and_stays_unbiased(self):
        scene = small("cornell.txt", (32, 32))
        base = render(scene, 200)
        rr = render(scene, 200, russian_roulette=True)
        # RR must reduce surviving paths at depths >= rr_start_depth
        a = np.asarray(base.last_alive_counts)
        b = np.asarray(rr.last_alive_counts)
        assert b[5] < a[5]
        # ...without biasing the estimate (compensated termination)
        m_base = (base.image() / 200).mean()
        m_rr = (rr.image() / 200).mean()
        assert abs(m_rr - m_base) / m_base < 0.08, (m_base, m_rr)


class TestDepthOfField:
    def test_dof_blurs_defocused_region(self):
        # widen the aperture so the defocus is detectable at 64x64
        scene = small("cornell_dof.txt", (64, 64), aperture=1.2, focal=9.5)
        sharp = render(scene, 96, antialias=True).image() / 96
        dof = render(scene, 96, antialias=True, depth_of_field=True).image() / 96

        def edge_energy(img, sl):
            g = img[sl].mean(axis=-1)
            return np.abs(np.diff(g, axis=0)).mean() + np.abs(
                np.diff(g, axis=1)
            ).mean()

        # far mirror sphere at (2,6,-3.5) r=2.5, camera (0,5,10.5): center
        # projects to accumulator pixel ~(row 30, col 27), ~6 px radius
        far = (slice(22, 38), slice(19, 35))
        assert edge_energy(dof, far) < edge_energy(sharp, far), (
            edge_energy(dof, far),
            edge_energy(sharp, far),
        )

    def test_aa_changes_primary_rays(self):
        scene = small("cornell.txt", (16, 16))
        a = render(scene, 2).image()
        b = render(scene, 2, antialias=True).image()
        assert np.abs(a - b).max() > 1e-3


class TestAliveCountLogging:
    def test_counts_exposed(self):
        r = render(small("cornell.txt", (16, 16)), 1)
        counts = np.asarray(r.last_alive_counts)
        assert counts.shape == (8,)
        assert counts.dtype.kind == "i"


class TestDirectLighting:
    def test_unbiased_vs_path_tracing(self):
        """NEE replaces the final hemisphere sample with an area light
        sample — same expected image (both unbiased for the last direct
        term)."""
        scene = small("cornell.txt", (32, 32))
        a = render(scene, 250).image() / 250
        b = render(scene, 250, direct_lighting=True).image() / 250
        assert abs(b.mean() - a.mean()) / a.mean() < 0.08, (a.mean(), b.mean())

    def test_final_depth_retires_all(self):
        scene = small("cornell.txt", (16, 16))
        r = render(scene, 1, direct_lighting=True)
        counts = np.asarray(r.last_alive_counts)
        assert counts[-1] == 0


class TestMotionBlur:
    def test_moving_sphere_blurs(self, tmp_path):
        """A fast-moving emissive sphere must light more pixels (smeared)
        with motion blur on than off."""
        import os
        from tests.conftest import SCENES

        with open(os.path.join(SCENES, "sphere.txt")) as f:
            text = f.read()
        assert "SCALE       3 3 3" in text
        text = text.replace(
            "SCALE       3 3 3", "SCALE       3 3 3\nVELOCITY    6 0 0"
        )
        p = tmp_path / "moving.txt"
        p.write_text(text)
        from project3_cuda_path_tracer_tpu.models.scene import load_scene

        scene = small_path(str(p), (48, 48))
        static = render(scene, 64).image() / 64
        moving = render(scene, 64, motion_blur=True).image() / 64
        lit_static = (static.sum(-1) > 0.05).mean()
        lit_moving = (moving.sum(-1) > 0.05).mean()
        assert lit_moving > lit_static * 1.2, (lit_static, lit_moving)

    def test_static_scene_unchanged(self):
        """Zero velocities: motion blur must be a no-op (bit-stable
        modulo the unused time draw)."""
        scene = small("cornell.txt", (16, 16))
        a = render(scene, 3).image()
        b = render(scene, 3, motion_blur=True).image()
        np.testing.assert_allclose(a, b, atol=1e-4)


def small_path(path, res):
    from project3_cuda_path_tracer_tpu.models.scene import load_scene

    scene = load_scene(path)
    cam = scene.state.camera
    scene.state.camera = derive_camera(
        res,
        cam.position,
        cam.look_at,
        np.array([0, 1, 0], np.float32),
        float(cam.fov[1]),
    )
    return scene


class TestTextures:
    def test_textured_scene_parses_and_renders(self):
        import os
        from tests.conftest import SCENES

        scene = small_path(os.path.join(SCENES, "textured.txt"), (48, 48))
        m = scene.materials
        assert m.tex_kind[1] == 1  # checker floor
        assert m.tex_kind[2] == 2  # file-textured wall
        assert m.bump_id[4] >= 0  # bumped sphere
        assert scene.textures.shape[0] == 1
        assert scene.bumps.shape[0] == 1

        r = render(scene, 32)
        img = r.image() / 32
        assert np.isfinite(img).all() and img.max() > 0.5

    def test_checker_modulates_floor(self):
        """Floor brightness must alternate cells (procedural checker)."""
        import os
        from tests.conftest import SCENES

        scene = small_path(os.path.join(SCENES, "textured.txt"), (64, 64))
        img = render(scene, 96).image() / 96
        # bottom rows of the accumulator = floor; sample a horizontal strip
        strip = img[56:62, 8:56].mean(axis=(0, 2))
        # checker cells at TEXSCALE .8 in world units ~ several px: the
        # strip must show strong local contrast, unlike a flat floor
        contrast = strip.max() / max(strip.min(), 1e-6)
        assert contrast > 1.5, contrast

    def test_untextured_unchanged(self, cornell_scene):
        """Texture plumbing must not alter untextured scenes (static
        flags gate it out of the trace entirely)."""
        scene = small("cornell.txt", (16, 16))
        from project3_cuda_path_tracer_tpu.models.device import scene_to_device

        ds = scene_to_device(scene, use_bvh=False)
        assert not ds.any_textured and not ds.any_bump
        img = render(scene, 2).image()
        assert np.isfinite(img).all()


class TestSubsurface:
    def test_sss_scene_translucent(self):
        """SSS sphere transmits light (brighter behind-the-sphere region
        than an opaque diffuse sphere of the same color) and renders
        finite."""
        import os
        from tests.conftest import SCENES

        sss = small_path(os.path.join(SCENES, "cornell_sss.txt"), (32, 32))
        from project3_cuda_path_tracer_tpu.models.device import scene_to_device

        ds = scene_to_device(sss, use_bvh=False)
        assert ds.any_sss
        img = render(sss, 48).image() / 48
        assert np.isfinite(img).all() and img.max() > 0.5

        # opaque-diffuse version of the same scene: SSS must differ
        import dataclasses

        opaque = small_path(os.path.join(SCENES, "cornell_sss.txt"), (32, 32))
        z = opaque.materials.subsurface.copy(); z[:] = 0.0
        opaque.materials = dataclasses.replace(opaque.materials, subsurface=z)
        img2 = render(opaque, 48).image() / 48
        assert np.abs(img - img2)[12:20, 12:20].mean() > 1e-3
