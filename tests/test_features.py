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
