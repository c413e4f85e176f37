"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8).

The reference is single-GPU; these validate the TPU-native scale-out
axes (SURVEY.md §2 parallelism checklist): sample-batch psum and
pixel-tile sharding must be radiometrically consistent with the
single-device renderer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from project3_cuda_path_tracer_tpu.models.device import (
    camera_to_device,
    scene_to_device,
)
from project3_cuda_path_tracer_tpu.ops.vec import Vec3
from project3_cuda_path_tracer_tpu.parallel.shard import (
    make_mesh,
    render_iteration_sharded,
    shard_accumulator,
)
from project3_cuda_path_tracer_tpu.render import RenderSettings, Renderer
from tests.conftest import make_small_cornell


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def _setup(cornell_scene, res=(32, 32)):
    scene = make_small_cornell(cornell_scene, res)
    ds = scene_to_device(scene, use_bvh=False)
    cam = camera_to_device(scene.state.camera)
    return scene, ds, cam


class TestSampleSharding:
    def test_spp_sharding_equals_sequential(self, cornell_scene, eight_devices):
        """8-way sample sharding: one sharded call == 8 sequential
        single-device iterations (same RNG streams by construction)."""
        scene, ds, cam = _setup(cornell_scene)
        settings = RenderSettings(trace_depth=4, use_bvh=False)
        mesh = make_mesh((8,), ("spp",), devices=eight_devices)

        P = scene.state.camera.pixel_count
        accum = Vec3.zeros((P,))
        sharded = render_iteration_sharded(
            ds, cam, accum, jnp.int32(1),
            settings=settings, mesh=mesh, spp_axis="spp", px_axis=None,
        )

        r = Renderer(scene, settings)
        for _ in range(8):
            r.step()
        seq = r.accum

        np.testing.assert_allclose(
            np.asarray(sharded.x), np.asarray(seq.x), rtol=1e-4, atol=1e-4
        )

    def test_pixel_sharding_equals_full_frame(self, cornell_scene, eight_devices):
        """(2 spp x 4 px) 2D mesh == 2 sequential full-frame iterations."""
        scene, ds, cam = _setup(cornell_scene)
        settings = RenderSettings(trace_depth=4, use_bvh=False)
        mesh = make_mesh((2, 4), ("spp", "px"), devices=eight_devices)

        P = scene.state.camera.pixel_count
        accum = shard_accumulator(Vec3.zeros((P,)), mesh, "px")
        sharded = render_iteration_sharded(
            ds, cam, accum, jnp.int32(1),
            settings=settings, mesh=mesh, spp_axis="spp", px_axis="px",
        )

        r = Renderer(scene, settings)
        r.step()
        r.step()
        np.testing.assert_allclose(
            np.asarray(sharded.x), np.asarray(r.accum.x), rtol=1e-4, atol=1e-4
        )

    def test_progressive_sharded_accumulation(self, cornell_scene, eight_devices):
        """Two sharded calls accumulate like 16 sequential iterations."""
        scene, ds, cam = _setup(cornell_scene, res=(16, 16))
        settings = RenderSettings(trace_depth=3, use_bvh=False)
        mesh = make_mesh((8,), ("spp",), devices=eight_devices)
        P = scene.state.camera.pixel_count
        accum = Vec3.zeros((P,))
        for call in (1, 2):
            accum = render_iteration_sharded(
                ds, cam, accum, jnp.int32(call),
                settings=settings, mesh=mesh, spp_axis="spp", px_axis=None,
            )
        r = Renderer(scene, settings)
        for _ in range(16):
            r.step()
        np.testing.assert_allclose(
            np.asarray(accum.x), np.asarray(r.accum.x), rtol=1e-4, atol=1e-4
        )
