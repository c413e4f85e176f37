"""Pallas bounce megakernel vs the XLA pipeline — interpreter-mode
equivalence tests (SURVEY.md §4: interpret=True so kernels test without
a TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu.models.device import (
    camera_to_device,
    scene_to_device,
)
from project3_cuda_path_tracer_tpu.ops.camera import generate_rays
from project3_cuda_path_tracer_tpu.ops.megakernel import bounce_step_pallas
from project3_cuda_path_tracer_tpu.ops.sweep import intersect_scene
from project3_cuda_path_tracer_tpu.ops.vec import Vec3
from project3_cuda_path_tracer_tpu.render import (
    RenderSettings,
    Renderer,
    _shade_step,
)
from tests.conftest import make_small_cornell


def _initial_state(scene_name, cornell_scene, res=(32, 32), settings=None):
    from project3_cuda_path_tracer_tpu.models.scene import load_scene
    import os

    from tests.conftest import SCENES

    if scene_name == "cornell":
        scene = make_small_cornell(cornell_scene, res)
    else:
        scene = make_small_cornell(
            load_scene(os.path.join(SCENES, scene_name)), res
        )
    ds = scene_to_device(scene, use_bvh=False)
    cam = camera_to_device(scene.state.camera)
    o, d, pix = generate_rays(cam, jnp.int32(1), False, False)
    P = pix.shape[0]
    state = (
        o,
        d,
        Vec3.ones((P,)),
        Vec3.zeros((P,)),
        jnp.ones((P,), bool),
        pix,
    )
    return ds, state


def _xla_bounce(state, ds, it, depth, settings):
    isect = intersect_scene(state[0], state[1], ds, use_bvh=False)
    return _shade_step(state, isect, ds, it, depth, settings)


def assert_state_close(a, b, atol=1e-4, outlier_frac=0.01):
    """Lane-wise comparison tolerating a small fraction of outliers:
    rays grazing geometry seams (ceiling/wall edges) tie in t at float
    precision, and the two compilations may legitimately break the tie
    toward different (equally valid) geoms — measured ~0.4% of lanes on
    Cornell. Those lanes then diverge completely (different normal ->
    different hemisphere basis), so exact comparison is the wrong test."""
    names = ["origins", "dirs", "throughput", "radiance"]
    for i, name in enumerate(names):
        for c in "xyz":
            av = np.asarray(getattr(a[i], c))
            bv = np.asarray(getattr(b[i], c))
            bad = np.abs(av - bv) > atol
            assert bad.mean() <= outlier_frac, (
                f"{name}.{c}: {bad.mean():.2%} lanes differ "
                f"(max {np.abs(av - bv).max():.4f})"
            )
    alive_diff = np.asarray(a[4]) != np.asarray(b[4])
    assert alive_diff.mean() <= outlier_frac
    np.testing.assert_array_equal(np.asarray(a[5]), np.asarray(b[5]))


class TestMegakernelEquivalence:
    def test_cornell_one_bounce(self, cornell_scene):
        settings = RenderSettings(trace_depth=8, use_bvh=False)
        ds, state = _initial_state("cornell", cornell_scene)
        a = bounce_step_pallas(
            state, ds, jnp.int32(1), jnp.int32(0), settings, interpret=True
        )
        b = _xla_bounce(state, ds, jnp.int32(1), jnp.int32(0), settings)
        assert_state_close(a, b)

    def test_cornell_three_bounces(self, cornell_scene):
        settings = RenderSettings(trace_depth=8, use_bvh=False)
        ds, sa = _initial_state("cornell", cornell_scene)
        sb = sa
        for depth in range(3):
            sa = bounce_step_pallas(
                sa, ds, jnp.int32(2), jnp.int32(depth), settings, interpret=True
            )
            sb = _xla_bounce(sb, ds, jnp.int32(2), jnp.int32(depth), settings)
        # seam-tie divergence compounds per bounce (~0.4%/bounce)
        assert_state_close(sa, sb, atol=3e-4, outlier_frac=0.03)

    def test_glass_scene_with_rr(self, cornell_scene):
        """Exercises the Fresnel branch + Russian roulette slots."""
        settings = RenderSettings(
            trace_depth=8, use_bvh=False, russian_roulette=True, rr_start_depth=1
        )
        ds, sa = _initial_state("cornell_glass.txt", cornell_scene)
        sb = sa
        for depth in range(3):
            sa = bounce_step_pallas(
                sa, ds, jnp.int32(5), jnp.int32(depth), settings, interpret=True
            )
            sb = _xla_bounce(sb, ds, jnp.int32(5), jnp.int32(depth), settings)
        assert_state_close(sa, sb, atol=3e-4, outlier_frac=0.03)

    def test_many_materials_partial_reflective(self, cornell_scene):
        """Exercises the spec/diffuse lottery slot (0<REFL<1)."""
        settings = RenderSettings(trace_depth=8, use_bvh=False)
        ds, sa = _initial_state("many_materials.txt", cornell_scene)
        assert ds.any_partial_reflective
        a = bounce_step_pallas(
            sa, ds, jnp.int32(3), jnp.int32(0), settings, interpret=True
        )
        b = _xla_bounce(sa, ds, jnp.int32(3), jnp.int32(0), settings)
        assert_state_close(a, b)


class TestEndToEndPallasPath:
    def test_full_render_matches_xla(self, cornell_scene):
        """trace_paths(use_pallas=True) == use_pallas=False at 32x32
        (pool is tile-aligned: 1024 lanes)."""
        scene = make_small_cornell(cornell_scene, (32, 32))
        from jax.experimental.pallas import tpu as pltpu

        rp = Renderer(
            scene, RenderSettings(trace_depth=4, use_bvh=False, use_pallas=True)
        )
        rx = Renderer(
            scene, RenderSettings(trace_depth=4, use_bvh=False, use_pallas=False)
        )
        with pltpu.force_tpu_interpret_mode():
            rp.step()
        rx.step()
        diff = np.abs(rp.image() - rx.image())
        assert (diff > 1e-3).mean() < 0.02  # seam-tie outliers only
        assert np.median(diff) < 1e-5

    def test_unaligned_pool_padding(self, cornell_scene):
        """24x24 = 576 lanes (not a multiple of 1024) exercises padding."""
        scene = make_small_cornell(cornell_scene, (24, 24))
        from jax.experimental.pallas import tpu as pltpu

        rp = Renderer(
            scene, RenderSettings(trace_depth=3, use_bvh=False, use_pallas=True)
        )
        rx = Renderer(
            scene, RenderSettings(trace_depth=3, use_bvh=False, use_pallas=False)
        )
        with pltpu.force_tpu_interpret_mode():
            rp.step()
        rx.step()
        diff = np.abs(rp.image() - rx.image())
        assert (diff > 1e-3).mean() < 0.02
        assert np.median(diff) < 1e-5


class TestGlossySpecular:
    def test_glossy_equivalence_and_spread(self, cornell_scene):
        """SPECEX>0: Pallas == XLA, and the glossy lobe actually spreads
        reflections (directions differ from the perfect mirror)."""
        import copy

        from tests.conftest import make_small_cornell

        import dataclasses

        scene = make_small_cornell(cornell_scene, (32, 32))
        # independent materials copy — the fixture is session-scoped and
        # make_small_cornell only shallow-copies the Scene
        sexp = cornell_scene.materials.specular_exponent.copy()
        sexp[4] = 64.0  # glossy mirror
        scene.materials = dataclasses.replace(
            cornell_scene.materials, specular_exponent=sexp
        )
        ds = scene_to_device(scene, use_bvh=False)
        assert ds.any_glossy

        cam = camera_to_device(scene.state.camera)
        from project3_cuda_path_tracer_tpu.ops.camera import generate_rays

        o, d, pix = generate_rays(cam, jnp.int32(1), False, False)
        P = pix.shape[0]
        state = (o, d, Vec3.ones((P,)), Vec3.zeros((P,)),
                 jnp.ones((P,), bool), pix)
        settings = RenderSettings(trace_depth=8, use_bvh=False)
        a = bounce_step_pallas(
            state, ds, jnp.int32(1), jnp.int32(0), settings, interpret=True
        )
        b = _xla_bounce(state, ds, jnp.int32(1), jnp.int32(0), settings)
        assert_state_close(a, b)

        # sanity: glossy dirs differ from the perfect-mirror scene's
        ds_perfect = scene_to_device(
            make_small_cornell(cornell_scene, (32, 32)), use_bvh=False
        )
        c = _xla_bounce(state, ds_perfect, jnp.int32(1), jnp.int32(0), settings)
        mirror_lanes = np.asarray(
            intersect_scene(o, d, ds_perfect, use_bvh=False).material_id
        ) == 4
        db = np.asarray(b[1].x)[mirror_lanes]
        dc = np.asarray(c[1].x)[mirror_lanes]
        assert np.abs(db - dc).max() > 1e-3


class TestMeshMegakernel:
    def test_mesh_chunk_sweep_matches_naive(self, cornell_scene):
        """Gather-free chunk-culled mesh path in the megakernel vs the
        XLA naive triangle sweep (interpret mode)."""
        ds, state = _initial_state("mesh.txt", cornell_scene)
        assert any(cn > 0 for cn, _ in
                   [(cn, cs) for cs, cn in ds.chunk_ranges])
        settings = RenderSettings(trace_depth=8, use_bvh=False)
        a = bounce_step_pallas(
            state, ds, jnp.int32(1), jnp.int32(0), settings, interpret=True
        )
        b = _xla_bounce(state, ds, jnp.int32(1), jnp.int32(0), settings)
        assert_state_close(a, b, atol=3e-4, outlier_frac=0.02)

    def test_mesh_partial_supernode_matches_naive(self, cornell_scene, tmp_path):
        """The two-level hierarchy with a PARTIAL trailing supernode:
        knot.obj has 4800 tris -> 150 chunks -> 4 full + 1 partial
        32-chunk supernode (mesh.txt's icosphere is exactly 5 full).
        Guards the in-kernel chunk-count clamp."""
        import os

        from project3_cuda_path_tracer_tpu.models.scene import load_scene
        from tests.conftest import SCENES, make_small_cornell

        text = open(os.path.join(SCENES, "mesh.txt")).read()
        text = text.replace(
            "assets/icosphere.obj",
            os.path.join(SCENES, "assets", "knot.obj"),
        )
        p = tmp_path / "mesh_knot.txt"
        p.write_text(text)
        scene = make_small_cornell(load_scene(str(p)), (32, 32))
        ds = scene_to_device(scene, use_bvh=False)
        assert ds.super_ranges[6][1] == 5  # 150 chunks -> ceil/32 = 5
        assert ds.chunk_ranges[6][1] % 32 != 0  # genuinely partial
        cam = camera_to_device(scene.state.camera)
        o, d, pix = generate_rays(cam, jnp.int32(1), False, False)
        P = pix.shape[0]
        state = (o, d, Vec3.ones((P,)), Vec3.zeros((P,)),
                 jnp.ones((P,), bool), pix)
        settings = RenderSettings(trace_depth=8, use_bvh=False)
        a = bounce_step_pallas(
            state, ds, jnp.int32(1), jnp.int32(0), settings, interpret=True
        )
        b = _xla_bounce(state, ds, jnp.int32(1), jnp.int32(0), settings)
        assert_state_close(a, b, atol=3e-4, outlier_frac=0.02)

    def test_mesh_full_render_pallas(self, cornell_scene):
        """End-to-end: mesh scene rendered through the Pallas path
        (fused raygen + chunk-culled mesh) matches the XLA path."""
        import os

        from jax.experimental.pallas import tpu as pltpu

        from project3_cuda_path_tracer_tpu.models.scene import load_scene
        from tests.conftest import SCENES, make_small_cornell

        scene = make_small_cornell(
            load_scene(os.path.join(SCENES, "mesh.txt")), (32, 32)
        )
        rp = Renderer(
            scene, RenderSettings(trace_depth=3, use_bvh=False, use_pallas=True)
        )
        rx = Renderer(
            scene, RenderSettings(trace_depth=3, use_bvh=False, use_pallas=False)
        )
        with pltpu.force_tpu_interpret_mode():
            rp.step()
        rx.step()
        diff = np.abs(rp.image() - rx.image())
        assert (diff > 1e-3).mean() < 0.02
        assert np.median(diff) < 1e-5


class TestCompactionPredication:
    def test_pallas_compact_matches_plain(self, cornell_scene):
        """compact=True with the megakernel: cumsum permutation + dead-
        tile predication must stay radiometrically identical."""
        from jax.experimental.pallas import tpu as pltpu

        scene = make_small_cornell(cornell_scene, (32, 32))
        rp = Renderer(
            scene,
            RenderSettings(trace_depth=4, use_bvh=False, use_pallas=True, compact=True),
        )
        rx = Renderer(
            scene, RenderSettings(trace_depth=4, use_bvh=False, use_pallas=False)
        )
        with pltpu.force_tpu_interpret_mode():
            rp.step()
        rx.step()
        diff = np.abs(rp.image() - rx.image())
        assert (diff > 1e-3).mean() < 0.02
        assert np.median(diff) < 1e-5


class TestWholeIterationKernel:
    def test_matches_per_bounce_path(self, cornell_scene):
        """render_batch's whole-iteration kernel == step()'s per-bounce
        kernels (same RNG streams by construction)."""
        from jax.experimental.pallas import tpu as pltpu

        scene = make_small_cornell(cornell_scene, (32, 32))
        s = RenderSettings(trace_depth=4, use_bvh=False, use_pallas=True)
        ra = Renderer(scene, s)
        rb = Renderer(scene, s)
        with pltpu.force_tpu_interpret_mode():
            ra.step_batch(2)   # whole-iteration kernel
            rb.step()          # per-bounce kernels
            rb.step()
        diff = np.abs(ra.image() - rb.image())
        assert (diff > 1e-3).mean() < 0.02
        assert np.median(diff) < 1e-5

    def test_glass_scene_whole_kernel(self, cornell_scene):
        from jax.experimental.pallas import tpu as pltpu

        ds_scene = make_small_cornell(cornell_scene, (32, 32))
        import os
        from project3_cuda_path_tracer_tpu.models.scene import load_scene
        from tests.conftest import SCENES

        scene = make_small_cornell(
            load_scene(os.path.join(SCENES, "cornell_glass.txt")), (32, 32)
        )
        s = RenderSettings(
            trace_depth=4, use_bvh=False, use_pallas=True, russian_roulette=True
        )
        ra = Renderer(scene, s)
        rx = Renderer(scene, RenderSettings(trace_depth=4, use_bvh=False,
                                            russian_roulette=True))
        with pltpu.force_tpu_interpret_mode():
            ra.step_batch(1)
        rx.step()
        diff = np.abs(ra.image() - rx.image())
        assert (diff > 1e-3).mean() < 0.02
        assert np.median(diff) < 1e-5


class TestCheckerMegakernel:
    def test_checker_scene_rides_pallas_and_matches_xla(self):
        """Procedural-checker-only scenes run in-kernel (no gathers);
        the fused path must match the XLA texture path."""
        import os

        from jax.experimental.pallas import tpu as pltpu

        from project3_cuda_path_tracer_tpu.models.scene import load_scene
        from project3_cuda_path_tracer_tpu.ops.megakernel import checker_only
        from tests.conftest import SCENES, make_small_cornell

        scene = make_small_cornell(
            load_scene(os.path.join(SCENES, "checker.txt")), (32, 32)
        )
        ds = scene_to_device(scene, use_bvh=False)
        assert checker_only(ds)
        rp = Renderer(
            scene, RenderSettings(trace_depth=3, use_pallas=True)
        )
        rx = Renderer(scene, RenderSettings(trace_depth=3))
        with pltpu.force_tpu_interpret_mode():
            rp.step()
        rx.step()
        diff = np.abs(rp.image() - rx.image())
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.02

    def test_file_textures_still_fall_back(self):
        """textured.txt (file texture + bump) must NOT claim the
        checker-only fast path (it rides the one-hot atlas fetch,
        file_tex_ok, instead)."""
        import os

        from project3_cuda_path_tracer_tpu.models.scene import load_scene
        from project3_cuda_path_tracer_tpu.ops.megakernel import (
            checker_only,
            file_tex_ok,
        )
        from tests.conftest import SCENES

        ds = scene_to_device(
            load_scene(os.path.join(SCENES, "textured.txt")), use_bvh=False
        )
        assert not checker_only(ds)
        assert file_tex_ok(ds)

    def test_file_texture_scene_rides_pallas_and_matches_xla(self):
        """File-textured + bump-mapped scenes fetch texels in-kernel
        via the one-hot MXU atlas gather (_file_tex_fetch/_bump_fetch);
        the fused path must match the XLA apply_textures path
        bit-near-exactly (same int*float32(1/255) texels, same f32
        bilinear order)."""
        import os

        from jax.experimental.pallas import tpu as pltpu

        from project3_cuda_path_tracer_tpu.models.scene import load_scene
        from tests.conftest import SCENES, make_small_cornell

        scene = make_small_cornell(
            load_scene(os.path.join(SCENES, "textured.txt")), (32, 32)
        )
        settings = RenderSettings(trace_depth=3, use_pallas=True)
        from project3_cuda_path_tracer_tpu.render import kernel_plan

        ds = scene_to_device(scene, use_bvh=False)
        plan = kernel_plan(ds, settings)
        assert plan.textures_ok and plan.whole_kernel
        rp = Renderer(scene, settings)
        rx = Renderer(scene, RenderSettings(trace_depth=3))
        with pltpu.force_tpu_interpret_mode():
            rp.step()
        rx.step()
        diff = np.abs(rp.image() - rx.image())
        assert np.median(diff) < 1e-5
        assert (diff > 1e-3).mean() < 0.02
