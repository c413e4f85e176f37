"""Environment lighting tests (ENVLIGHT / ENVMAP / ENVSCALE camera
keys — extension beyond the reference's constant-black background,
src/sceneStructs.h:8)."""

import os

import numpy as np
import pytest

from project3_cuda_path_tracer_tpu.render import Renderer, RenderSettings
from tests.conftest import SCENES


@pytest.fixture(scope="module")
def env_scene():
    from project3_cuda_path_tracer_tpu.models.scene import load_scene

    return load_scene(os.path.join(SCENES, "env.txt"))


def small(scene, res=(32, 32)):
    import copy

    from project3_cuda_path_tracer_tpu.models.scene import derive_camera

    s = copy.copy(scene)
    s.state = copy.copy(scene.state)
    cam = scene.state.camera
    s.state.camera = derive_camera(
        res, cam.position, cam.look_at,
        np.array([0, 1, 0], np.float32), float(cam.fov[1]),
    )
    return s


class TestParsing:
    def test_envlight_parsed(self, env_scene):
        np.testing.assert_allclose(
            env_scene.env_color, [0.55, 0.7, 0.95], atol=1e-6
        )
        assert env_scene.env_map.size == 0

    def test_envmap_and_scale(self, tmp_path):
        from project3_cuda_path_tracer_tpu.models.scene import load_scene

        text = open(os.path.join(SCENES, "env.txt")).read()
        text = text.replace(
            "ENVLIGHT    .55 .7 .95",
            f"ENVMAP      {os.path.join(SCENES, 'assets', 'sky.png')}\n"
            "ENVSCALE    2.0",
        )
        p = tmp_path / "env_map.txt"
        p.write_text(text)
        scene = load_scene(str(p))
        assert scene.env_map.shape == (256, 512, 3)
        assert scene.env_map.max() > 1.0  # ENVSCALE 2 on an LDR image

    def test_plain_scenes_have_no_env(self, cornell_scene):
        from project3_cuda_path_tracer_tpu.models.device import scene_to_device

        ds = scene_to_device(cornell_scene, use_bvh=False)
        assert not ds.has_env_const and not ds.has_env_map


class TestConstantEnv:
    def test_camera_miss_shows_exact_env_color(self, env_scene):
        """Primary rays that escape contribute exactly ENVLIGHT (full
        throughput, depth 0) — a closed-form check."""
        r = Renderer(small(env_scene), RenderSettings(trace_depth=4))
        r.step()
        img = r.image()
        # top rows look over the floor into the sky
        sky = img[0, 2:30, :]
        np.testing.assert_allclose(
            sky, np.tile([0.55, 0.7, 0.95], (28, 1)), atol=1e-5
        )

    def test_sky_lights_the_scene(self, env_scene):
        r = Renderer(small(env_scene), RenderSettings(trace_depth=4))
        r.step_batch(24)
        img = r.image() / 24
        assert np.isfinite(img).all()
        # floor region (bottom rows) is lit purely by the sky
        assert img[26:, :, :].mean() > 0.1

    def test_megakernel_matches_xla(self, env_scene):
        from jax.experimental.pallas import tpu as pltpu

        s = small(env_scene)
        rp = Renderer(
            s, RenderSettings(trace_depth=3, use_pallas=True)
        )
        rx = Renderer(s, RenderSettings(trace_depth=3))
        with pltpu.force_tpu_interpret_mode():
            rp.step()
        rx.step()
        diff = np.abs(rp.image() - rx.image())
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.02

    def test_nee_composes_with_env(self, env_scene):
        # env.txt has no emissive geom, so add light sampling would
        # assert; check a cornell-with-env hybrid instead
        import copy

        from project3_cuda_path_tracer_tpu.models.scene import load_scene

        cornell = load_scene(os.path.join(SCENES, "cornell.txt"))
        s = small(copy.copy(cornell), (16, 16))
        s.env_color = np.array([0.3, 0.3, 0.3], np.float32)
        nee = Renderer(
            s, RenderSettings(trace_depth=4, use_bvh=False, nee_mis=True)
        )
        nee.step_batch(64)
        brute = Renderer(s, RenderSettings(trace_depth=4, use_bvh=False))
        brute.step_batch(64)
        a = nee.image() / 64
        b = brute.image() / 64
        assert np.isfinite(a).all()
        # same scene, both estimators see the env through the open side
        assert abs(a.mean() - b.mean()) < 0.05


class TestEnvMap:
    def test_directional_lookup(self, env_scene, tmp_path):
        """Camera-miss pixels sample the lat-long map by direction:
        up-looking pixels must be brighter (zenith) than horizon ones
        per the generated sky gradient."""
        import copy

        from project3_cuda_path_tracer_tpu.models.scene import (
            _load_env_map,
        )

        s = small(copy.copy(env_scene), (32, 32))
        s.env_map = _load_env_map(
            os.path.join(SCENES, "assets", "sky.png")
        )
        r = Renderer(s, RenderSettings(trace_depth=3))
        r.step()
        img = r.image()
        top_blue = img[0, 8:24, 2].mean()  # sky near zenith
        assert top_blue > 0.6
        # zenith rows brighter than rows near the horizon line
        assert img[0, :, :].mean() > img[8, :, :].mean() - 1e-3


class TestEnvMapKernel:
    def test_envmap_rides_pallas_and_matches_xla(self, env_scene, tmp_path):
        """Lat-long ENVMAP scenes are kernel-eligible via the one-hot
        f32 atlas fetch (megakernel._env_fetch); escaped-lane radiance
        must match the XLA env_radiance path (f32 texels move through
        the one-hot matmul exactly; only the transcendental u/v math
        can shift a boundary texel)."""
        import copy

        from jax.experimental.pallas import tpu as pltpu

        from project3_cuda_path_tracer_tpu.models.device import (
            scene_to_device,
        )
        from project3_cuda_path_tracer_tpu.models.scene import _load_env_map
        from project3_cuda_path_tracer_tpu.render import kernel_plan

        s = small(copy.copy(env_scene), (32, 32))
        s.env_map = _load_env_map(
            os.path.join(SCENES, "assets", "sky.png")
        ) * np.float32(1.5)  # exercise a non-integer ENVSCALE
        settings = RenderSettings(trace_depth=3, use_pallas=True)
        ds = scene_to_device(s, use_bvh=False)
        plan = kernel_plan(ds, settings)
        assert plan.whole_kernel or plan.bounce_kernel
        rp = Renderer(s, settings)
        with pltpu.force_tpu_interpret_mode():
            rp.step()
        rx = Renderer(s, RenderSettings(trace_depth=3))
        rx.step()
        diff = np.abs(rp.image() - rx.image())
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.02
