"""Tests for the single-source kernel-eligibility predicate
(render.kernel_plan) and the TPU mesh guard built on it.

Round 2 kept three hand-mirrored eligibility computations and the
advisor found two reachable disagreements; these tests pin the unified
behavior (ADVICE.md round 2, items 1 and 3)."""

import os

import pytest

from project3_cuda_path_tracer_tpu.models.device import scene_to_device
from project3_cuda_path_tracer_tpu.models.scene import load_scene
from project3_cuda_path_tracer_tpu.render import (
    RenderSettings,
    kernel_plan,
)

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


def _plan(scene_name, **settings):
    scene = load_scene(os.path.join(SCENES, scene_name))
    dev = scene_to_device(scene)
    return kernel_plan(dev, RenderSettings(trace_depth=8, **settings))


class TestKernelPlan:
    def test_cornell_whole_kernel(self):
        p = _plan("cornell.txt", use_pallas=True)
        assert p.whole_kernel and p.bounce_kernel
        assert not p.xla_mesh_exposure  # no mesh at all

    def test_mesh_covered_by_kernels(self):
        p = _plan("mesh.txt", use_pallas=True)
        assert p.mesh_pipeline and not p.bounce_kernel
        assert not p.whole_kernel  # mesh bounces go per-bounce now
        assert not p.xla_mesh_exposure

    def test_mesh_without_pallas_exposed(self):
        p = _plan("mesh.txt", use_pallas=False)
        assert not p.bounce_kernel and not p.mesh_pipeline
        assert p.xla_mesh_exposure

    def test_mesh_direct_lighting_covered_by_pallas_isect(self):
        """ADVICE r2 #1 found the final NEE step ran a full-pool XLA
        mesh intersect; it now routes through intersect_pipeline, so
        the config is exposure-free."""
        p = _plan("mesh.txt", use_pallas=True, direct_lighting=True)
        assert p.mesh_pipeline  # bounces ride the pipeline
        assert not p.whole_kernel
        assert p.pallas_isect  # the NEE step's intersect is Pallas too
        assert not p.xla_mesh_exposure

    def test_mesh_cache_covered_by_pallas_isect(self):
        """The first-bounce cache's depth-0 intersect also dispatches
        through the Pallas intersect pipeline."""
        p = _plan("mesh.txt", use_pallas=True, cache_first_bounce=True)
        assert p.pallas_isect and not p.xla_mesh_exposure

    def test_mesh_no_pallas_still_exposed(self):
        p = _plan("mesh.txt", use_pallas=False, cache_first_bounce=True)
        assert not p.pallas_isect and p.xla_mesh_exposure

    def test_mesh_nee_kernel_covers(self):
        p = _plan("mesh.txt", use_pallas=True, nee_mis=True)
        assert p.nee_kernel
        assert not p.xla_mesh_exposure

    def test_small_body_env_var(self, monkeypatch):
        """ADVICE r2 #3: the guard and render_batch must read the SAME
        small-body limit."""
        monkeypatch.setenv("PT_TPU_WHOLE_KERNEL_MAX_BODY", "4")
        p = _plan("mesh.txt", use_pallas=True, nee_mis=True)
        assert not p.small_body
        assert not p.nee_kernel  # fused NEE kernel now ineligible
        # (the XLA estimator's intersects still ride pallas_isect)
        assert p.pallas_isect and not p.xla_mesh_exposure
        monkeypatch.setenv("PT_TPU_WHOLE_KERNEL_MAX_BODY", "1000")
        p2 = _plan("mesh.txt", use_pallas=True, nee_mis=True)
        assert p2.nee_kernel and not p2.xla_mesh_exposure

    def test_env_scene_nee_has_no_kernel(self):
        """env.txt has no emissive geom: the fused NEE kernel must be
        ineligible (trace_paths raises a clear error instead)."""
        p = _plan("env.txt", use_pallas=True, nee_mis=True)
        assert not p.nee_kernel


class TestNeeNeedsLight:
    def test_clear_error_without_emissive(self):
        """ADVICE r2 #4: --nee on an env-lit scene must raise a clear
        ValueError, not die on a bare assert mid-trace."""
        import jax.numpy as jnp

        from project3_cuda_path_tracer_tpu.models.device import (
            camera_to_device,
        )
        from project3_cuda_path_tracer_tpu.render import (
            _empty_cache,
            trace_paths,
        )

        scene = load_scene(os.path.join(SCENES, "env.txt"))
        dev = scene_to_device(scene)
        cam = camera_to_device(scene.state.camera)
        settings = RenderSettings(trace_depth=4, nee_mis=True)
        with pytest.raises(ValueError, match="area light"):
            trace_paths(
                dev, cam, jnp.int32(1),
                _empty_cache(scene.state.camera.pixel_count),
                settings, False,
            )


class TestNeeBumpSingleApplication:
    def test_apply_textures_once_per_bounce(self, monkeypatch):
        """ADVICE r2 #2: --nee on a bump-mapped scene perturbed the
        shading normal twice (once in _nee_mis_bounce, again in
        _shade_step). Count apply_textures invocations through one
        nee_mis trace: exactly one per bounce."""
        import jax.numpy as jnp

        from project3_cuda_path_tracer_tpu.models.device import (
            camera_to_device,
        )
        from project3_cuda_path_tracer_tpu.ops import texture as tex_mod
        from project3_cuda_path_tracer_tpu.render import (
            _empty_cache,
            trace_paths,
        )

        scene = load_scene(os.path.join(SCENES, "textured.txt"))
        dev = scene_to_device(scene)
        assert dev.any_bump
        cam = camera_to_device(scene.state.camera)

        calls = []
        real = tex_mod.apply_textures

        def counting(*a, **kw):
            calls.append(1)
            return real(*a, **kw)

        monkeypatch.setattr(tex_mod, "apply_textures", counting)
        depth = 3
        settings = RenderSettings(trace_depth=depth, nee_mis=True)
        trace_paths(
            dev, cam, jnp.int32(1),
            _empty_cache(scene.state.camera.pixel_count),
            settings, False,
        )
        # one call per bounce; the lax.scan over middle bounces traces
        # its body once, so the TRACE count equals the number of
        # distinct bounce bodies (first, scanned-middle, last) = 3 for
        # depth >= 3. Pre-fix each non-last body traced it TWICE.
        assert len(calls) == 3


class TestTextureEligibility:
    """Round-3b texture predicates: in-kernel file/bump/env atlases."""

    def test_textured_scene_rides_kernels(self):
        p = _plan("textured.txt", use_pallas=True)
        assert p.textures_ok and p.whole_kernel and p.bounce_kernel

    def test_envmap_scene_rides_kernels(self):
        p = _plan("envmap.txt", use_pallas=True)
        assert p.whole_kernel and p.bounce_kernel

    def test_envmap_escape_hatch(self, monkeypatch):
        monkeypatch.setenv("PT_TPU_ENVMAP_KERNEL", "0")
        p = _plan("envmap.txt", use_pallas=True)
        assert not p.whole_kernel and not p.bounce_kernel

    def test_mesh_uv_textures_fully_in_kernel(self):
        """mesh_textured.txt: the pipeline's K3 carries OBJ UVs AND
        the fused tiers' _intersect_all does too (want_uv), so the
        scene is first-class everywhere — incl. the fused NEE tier."""
        p = _plan("mesh_textured.txt", use_pallas=True)
        assert p.mesh_pipeline and p.textures_ok
        pn = _plan("mesh_textured.txt", use_pallas=True, nee_mis=True)
        assert pn.nee_kernel or pn.nee_bounce_kernel
        assert not p.xla_mesh_exposure

    def test_too_many_textures_fall_back(self, monkeypatch):
        from project3_cuda_path_tracer_tpu.ops import megakernel

        monkeypatch.setattr(megakernel, "MAX_KERNEL_TEXTURES", 0)
        p = _plan("textured.txt", use_pallas=True)
        assert not p.whole_kernel and not p.bounce_kernel


class TestTriAxisEligibility:
    def test_tri_axis_forces_isect_only(self):
        """--shard tri=N: shading must consume the axis-merged hit, so
        only the intersect pipeline may stay in-kernel and the guard
        must not consider the scene exposed."""
        p = _plan("mesh.txt", use_pallas=True, tri_axis="tri")
        assert not p.mesh_pipeline and not p.bounce_kernel
        assert not p.whole_kernel
        assert p.pallas_isect
        assert not p.xla_mesh_exposure
