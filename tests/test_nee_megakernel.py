"""Fused NEE+MIS megakernel vs the XLA estimator — interpret-mode
equivalence (the same contract as tests/test_megakernel.py: identical
RNG streams => near-identical images, seam-tie outliers tolerated)."""

import numpy as np
import pytest

from project3_cuda_path_tracer_tpu.render import Renderer, RenderSettings
from tests.conftest import make_small_cornell


def _render_pair(scene, spp, **kw):
    from jax.experimental.pallas import tpu as pltpu

    rp = Renderer(
        scene, RenderSettings(use_pallas=True, nee_mis=True, **kw)
    )
    with pltpu.force_tpu_interpret_mode():
        rp.step_batch(spp)
    rx = Renderer(
        scene, RenderSettings(use_pallas=False, nee_mis=True, **kw)
    )
    rx.step_batch(spp)
    return rp.image(), rx.image()


class TestNeeMegakernelEquivalence:
    def test_cornell_matches_xla(self, cornell_scene):
        scene = make_small_cornell(cornell_scene, (32, 32))
        a, b = _render_pair(scene, 2, trace_depth=4, use_bvh=False)
        diff = np.abs(a - b)
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.03

    def test_with_rr_and_stratified(self, cornell_scene):
        scene = make_small_cornell(cornell_scene, (32, 32))
        a, b = _render_pair(
            scene, 2, trace_depth=5, use_bvh=False,
            russian_roulette=True, rr_start_depth=2, stratified=True,
        )
        diff = np.abs(a - b)
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.03

    def test_depth_one_final_only(self, cornell_scene):
        """D=1: only the is_last bounce (direct light via NEE)."""
        scene = make_small_cornell(cornell_scene, (32, 32))
        a, b = _render_pair(scene, 2, trace_depth=1, use_bvh=False)
        diff = np.abs(a - b)
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.03

    def test_variance_win_preserved(self, cornell_scene):
        """The fused kernel is still the NEE estimator: image converges
        visibly faster than brute force at tiny spp."""
        from jax.experimental.pallas import tpu as pltpu

        scene = make_small_cornell(cornell_scene, (16, 16))
        rn = Renderer(
            scene,
            RenderSettings(trace_depth=4, use_bvh=False,
                           use_pallas=True, nee_mis=True),
        )
        with pltpu.force_tpu_interpret_mode():
            rn.step_batch(4)
        img = rn.image() / 4
        assert np.isfinite(img).all()
        # NEE at 4 spp lights the floor everywhere; brute would not
        floor = img[12:, :, :]
        assert (floor.mean(axis=-1) > 0.01).mean() > 0.9


class TestNeeMeshShadowRays:
    def test_mesh_scene_matches_xla(self, cornell_scene):
        """NEE shadow rays traverse the mesh hierarchy with the
        light-distance cap (t_cap); interpret-mode equivalence on the
        icosphere scene covers that path."""
        import os

        from project3_cuda_path_tracer_tpu.models.scene import load_scene
        from tests.conftest import SCENES, make_small_cornell

        scene = make_small_cornell(
            load_scene(os.path.join(SCENES, "mesh.txt")), (32, 32)
        )
        a, b = _render_pair(scene, 1, trace_depth=3, use_bvh=False)
        diff = np.abs(a - b)
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.03


class TestGlossyNeeEquivalence:
    def test_glossy_scene_matches_xla(self, cornell_scene):
        """Round-3 glossy NEE: the fused kernel's mixed-BRDF light
        sampling must track the XLA estimator on a Phong-glossy
        scene (same lanes, same pdf model, same RNG)."""
        import copy

        s = copy.copy(cornell_scene)
        s.materials = copy.deepcopy(cornell_scene.materials)
        s.materials.has_reflective[4] = 1.0
        s.materials.specular_exponent[4] = 24.0
        s.materials.specular_color[4] = [0.9, 0.8, 0.7]
        scene = make_small_cornell(s, (32, 32))
        a, b = _render_pair(scene, 2, trace_depth=4, use_bvh=False)
        diff = np.abs(a - b)
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.03


class TestPerBounceNeeKernel:
    def test_big_body_fallback_matches_xla(self, cornell_scene, monkeypatch):
        """VERDICT r2 #9: bodies over the whole-kernel limit take the
        per-bounce fused NEE kernel (aux as pool lanes). Force the
        small-body limit down so Cornell exercises it, and require the
        same agreement contract as the whole-iteration form."""
        monkeypatch.setenv("PT_TPU_WHOLE_KERNEL_MAX_BODY", "1")
        from project3_cuda_path_tracer_tpu.models.device import (
            scene_to_device,
        )
        from project3_cuda_path_tracer_tpu.render import kernel_plan

        scene = make_small_cornell(cornell_scene, (32, 32))
        plan = kernel_plan(
            scene_to_device(scene),
            RenderSettings(trace_depth=4, nee_mis=True, use_pallas=True),
        )
        assert plan.nee_bounce_kernel and not plan.nee_kernel
        a, b = _render_pair(scene, 2, trace_depth=4, use_bvh=False)
        diff = np.abs(a - b)
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.03


class TestTexturedNee:
    def test_textured_bump_scene_matches_xla(self, cornell_scene):
        """File textures + bump are newly kernel-eligible for the NEE
        estimator (the one-hot atlas fetch runs before the light
        sample, so the textured albedo weights both the bounce and the
        shadow-ray contribution — same order as render._nee_mis_bounce)."""
        import os

        from project3_cuda_path_tracer_tpu.models.scene import load_scene
        from tests.conftest import SCENES

        scene = make_small_cornell(
            load_scene(os.path.join(SCENES, "textured.txt")), (32, 32)
        )
        a, b = _render_pair(scene, 2, trace_depth=3, use_bvh=False)
        diff = np.abs(a - b)
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.03

    def test_mesh_uv_textured_nee_matches_xla(self, cornell_scene):
        """mesh_textured.txt under --nee: the fused NEE kernel's
        _intersect_all carries OBJ UVs (want_uv) into the in-kernel
        atlas fetch — must match the XLA estimator."""
        import os

        from project3_cuda_path_tracer_tpu.models.scene import load_scene
        from tests.conftest import SCENES

        scene = make_small_cornell(
            load_scene(os.path.join(SCENES, "mesh_textured.txt")),
            (32, 32),
        )
        a, b = _render_pair(scene, 2, trace_depth=3, use_bvh=False)
        diff = np.abs(a - b)
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.03
