"""Debug-mode numeric net tests (utils/debug.py; SURVEY.md §5 sanitizer
row — the checkCUDAError analog, src/pathtrace.cu:17-39)."""

import numpy as np
import pytest

from project3_cuda_path_tracer_tpu.render import Renderer, RenderSettings
from project3_cuda_path_tracer_tpu.utils.debug import (
    assert_finite,
    checkify_sweep,
)
from tests.conftest import make_small_cornell


class TestAssertFinite:
    def test_clean_accumulator_passes(self, cornell_scene):
        r = Renderer(
            make_small_cornell(cornell_scene, (32, 32)),
            RenderSettings(trace_depth=4, use_bvh=False),
        )
        r.step()
        assert_finite(r.accum, r.iteration)

    def test_nan_is_caught_with_location(self, cornell_scene):
        import jax.numpy as jnp

        from project3_cuda_path_tracer_tpu.ops.vec import Vec3

        bad = Vec3(
            jnp.array([1.0, jnp.nan, 2.0]),
            jnp.ones((3,)),
            jnp.ones((3,)),
        )
        with pytest.raises(FloatingPointError, match="channel R has 1"):
            assert_finite(bad, 7)


class TestCheckifySweep:
    def test_sweep_clean_on_cornell(self, cornell_scene):
        """One checkified iteration: every gather/scatter in the pipeline
        bounds-checked instead of XLA-clamped."""
        r = Renderer(
            make_small_cornell(cornell_scene, (32, 32)),
            RenderSettings(trace_depth=4, use_bvh=False),
        )
        checkify_sweep(r)  # raises on any OOB index

    def test_cli_flag_smoke(self, tmp_path, monkeypatch):
        """--debug end-to-end through the CLI driver (tiny resolution)."""
        import os

        from project3_cuda_path_tracer_tpu.cli import main

        src = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scenes",
            "cornell.txt",
        )
        with open(src) as f:
            text = f.read()
        small = tmp_path / "cornell_small.txt"
        small.write_text(text.replace("RES         800 800", "RES         32 32"))
        monkeypatch.chdir(tmp_path)
        rc = main(
            [
                str(small),
                "--iterations", "2",
                "--depth", "3",
                "--debug",
                "--out-dir", str(tmp_path),
                "--log-every", "1",
            ]
        )
        assert rc == 0
