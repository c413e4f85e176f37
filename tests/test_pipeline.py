"""Equivalence tests for the per-bounce global-compaction mesh pipeline
(ops/pipeline.py) — interpret mode (pltpu.force_tpu_interpret_mode so
the in-kernel DMAs are modeled); hardware behavior is covered by
tools/smoke_pallas.py + the TPU bench."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from project3_cuda_path_tracer_tpu.models.device import (
    camera_to_device,
    scene_to_device,
)
from project3_cuda_path_tracer_tpu.models.scene import (
    derive_camera,
    load_scene,
)
from project3_cuda_path_tracer_tpu.ops.megakernel import bounce_step_pallas
from project3_cuda_path_tracer_tpu.ops.pipeline import bounce_step_pipeline
from project3_cuda_path_tracer_tpu.ops.vec import Vec3
from project3_cuda_path_tracer_tpu.render import (
    RenderSettings,
    generate_rays,
    kernel_plan,
    trace_paths,
    _empty_cache,
)

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


@pytest.fixture(scope="module")
def mesh_setup():
    scene = load_scene(os.path.join(SCENES, "mesh.txt"))
    c0 = scene.state.camera
    scene.state.camera = derive_camera(
        (128, 64), c0.position, c0.look_at,
        np.array([0, 1, 0], np.float32), float(c0.fov[1]),
    )
    dev = scene_to_device(scene, use_bvh=False)
    cam = camera_to_device(scene.state.camera)
    return scene, dev, cam


def _fresh_state(cam, it=1):
    o, d, pix = generate_rays(cam, jnp.int32(it), False, False)
    P = pix.shape[0]
    return (o, d, Vec3.ones((P,)), Vec3.zeros((P,)),
            jnp.ones((P,), bool), pix)


class TestPipelineEquivalence:
    def test_bit_identical_to_in_tile_kernel(self, mesh_setup):
        """The pipeline reorders WHERE lanes are computed, never WHAT:
        one bounce must be bit-identical to the in-tile megakernel."""
        _, dev, cam = mesh_setup
        settings = RenderSettings(trace_depth=3, use_bvh=False)
        state = _fresh_state(cam)
        with pltpu.force_tpu_interpret_mode():
            pal = bounce_step_pipeline(
                state, dev, jnp.int32(1), jnp.int32(0), settings
            )
            mk = bounce_step_pallas(
                state, dev, jnp.int32(1), jnp.int32(0), settings
            )
        for i in range(4):
            for c in "xyz":
                np.testing.assert_array_equal(
                    np.asarray(getattr(pal[i], c)),
                    np.asarray(getattr(mk[i], c)),
                    err_msg=f"state[{i}].{c}",
                )
        np.testing.assert_array_equal(
            np.asarray(pal[4]), np.asarray(mk[4])
        )

    def test_multi_bounce_against_kernel(self, mesh_setup):
        """Three chained bounces (live/dead lane evolution, seeded
        candidacy from prior hits) stay bit-identical."""
        _, dev, cam = mesh_setup
        settings = RenderSettings(trace_depth=3, use_bvh=False)
        sp = _fresh_state(cam)
        sk = sp
        with pltpu.force_tpu_interpret_mode():
            for depth in range(3):
                sp = bounce_step_pipeline(
                    sp, dev, jnp.int32(1), jnp.int32(depth), settings
                )
                sk = bounce_step_pallas(
                    sk, dev, jnp.int32(1), jnp.int32(depth), settings
                )
        for i in (2, 3):  # throughput + radiance carry everything
            for c in "xyz":
                np.testing.assert_array_equal(
                    np.asarray(getattr(sp[i], c)),
                    np.asarray(getattr(sk[i], c)),
                    err_msg=f"state[{i}].{c}",
                )

    def test_trace_paths_dispatches_pipeline(self, mesh_setup):
        """trace_paths with use_pallas on a mesh scene routes through
        the pipeline and agrees with the XLA estimator (identical RNG
        streams; rare seam-tie lanes may flip — documented class)."""
        scene, dev, cam = mesh_setup
        s_pal = RenderSettings(trace_depth=3, use_bvh=False, use_pallas=True)
        assert kernel_plan(dev, s_pal).mesh_pipeline
        s_xla = RenderSettings(trace_depth=3, use_bvh=False)
        P = scene.state.camera.pixel_count
        rad_x, _, _, _ = trace_paths(
            dev, cam, jnp.int32(1), _empty_cache(P), s_xla, False
        )
        with pltpu.force_tpu_interpret_mode():
            rad_p, _, _, _ = trace_paths(
                dev, cam, jnp.int32(1), _empty_cache(P), s_pal, False
            )
        for c in "xyz":
            a = np.asarray(getattr(rad_p, c))
            b = np.asarray(getattr(rad_x, c))
            close = np.isclose(a, b, rtol=1e-4, atol=1e-5)
            assert close.mean() > 0.99, (
                f"radiance.{c}: {100 * (1 - close.mean()):.2f}% mismatch"
            )


class TestIntersectPipeline:
    """intersect_pipeline: the TPU-safe intersect for XLA-shaded mesh
    configurations (file textures / bump / sort / cache / NEE shadows),
    with real per-corner mesh UVs (INSTRUCTION.md:114-116)."""

    def test_matches_xla_with_uvs(self):
        from project3_cuda_path_tracer_tpu.ops.pipeline import (
            intersect_pipeline,
        )
        from project3_cuda_path_tracer_tpu.ops.sweep import intersect_scene

        scene = load_scene(os.path.join(SCENES, "mesh_textured.txt"))
        c0 = scene.state.camera
        scene.state.camera = derive_camera(
            (64, 48), c0.position, c0.look_at,
            np.array([0, 1, 0], np.float32), float(c0.fov[1]),
        )
        dev = scene_to_device(scene, use_bvh=False)
        cam = camera_to_device(scene.state.camera)
        o, d, _pix = generate_rays(cam, jnp.int32(3), False, False)
        P = o.x.shape[0]
        assert P % (64 * 128) != 0  # exercises the internal pad path
        ref = intersect_scene(o, d, dev, use_bvh=False)
        with pltpu.force_tpu_interpret_mode():
            got = intersect_pipeline(
                o, d, jnp.ones((P,), bool), dev
            )
        for name in ("t", "tex_u", "tex_v"):
            a = np.asarray(getattr(got, name))
            b = np.asarray(getattr(ref, name))
            close = np.isclose(a, b, rtol=1e-4, atol=1e-5)
            assert close.mean() > 0.99, (
                f"{name}: {100 * (1 - close.mean()):.2f}% mismatch"
            )
        mat_match = (
            np.asarray(got.material_id) == np.asarray(ref.material_id)
        ).mean()
        assert mat_match > 0.99
        huv_match = (
            np.asarray(got.has_uv) == np.asarray(ref.has_uv)
        ).mean()
        assert huv_match > 0.99
        for c in "xyz":
            a = np.asarray(getattr(got.normal, c))
            b = np.asarray(getattr(ref.normal, c))
            close = np.isclose(a, b, rtol=1e-3, atol=1e-4)
            assert close.mean() > 0.99
