"""End-to-end render tests: golden comparison at low spp, toggle
neutrality, per-bounce alive curves, save contract (SURVEY.md §4)."""

import os

import numpy as np
import pytest

from project3_cuda_path_tracer_tpu.render import Renderer, RenderSettings
from tests.conftest import make_small_cornell


def render_small(scene, spp, res=(32, 32), **kw):
    r = Renderer(make_small_cornell(scene, res), RenderSettings(trace_depth=8, use_bvh=False, **kw))
    for _ in range(spp):
        r.step()
    return r


class TestEndToEnd:
    def test_basic_render_nonzero(self, cornell_scene):
        r = render_small(cornell_scene, 4)
        img = r.image() / 4
        assert img.max() > 0.5  # light visible
        assert img.mean() > 0.01
        assert np.isfinite(img).all()

    def test_progressive_convergence(self, cornell_scene):
        """More samples -> closer to the many-sample estimate (the
        eyeball-test of RNG/accumulation plumbing, src/pathtrace.cu:215-219,
        made quantitative)."""
        r = render_small(cornell_scene, 64)
        ref = r.image() / 64
        r4 = render_small(cornell_scene, 4)
        r16 = render_small(cornell_scene, 16)
        e4 = np.abs(r4.image() / 4 - ref).mean()
        e16 = np.abs(r16.image() / 16 - ref).mean()
        assert e16 < e4

    def test_alive_counts_decrease(self, cornell_scene):
        """Unterminated-rays-per-bounce must be monotonically
        non-increasing (INSTRUCTION.md:340-344 analysis, automated)."""
        r = render_small(cornell_scene, 1)
        counts = np.asarray(r.last_alive_counts)
        assert counts.shape == (8,)
        assert (np.diff(counts) <= 0).all()
        assert counts[0] < 32 * 32  # some direct light hits terminate

    def test_golden_match_statistical(self, cornell_scene, golden_image):
        """Low-spp 64x64 render vs the downsampled 5000-spp golden
        (img/REFERENCE_cornell.5000samp.png). The mirror-sphere region
        is excluded: the golden's sphere is diffuse-shaded although the
        scene says REFL=1. PROVEN numerically in round 2
        (tools/golden_sphere_analysis.py, 5000 spp on TPU,
        silhouette-exact mask): rendering the sphere as a mirror gives
        sphere-region MAD 0.1089 vs the golden; forcing it diffuse gives
        0.0138, with identical backgrounds (0.0087 vs 0.0085). See
        docs/ANALYSIS.md 'Golden mirror-sphere discrepancy'."""
        from PIL import Image

        r = render_small(cornell_scene, 48, res=(64, 64))
        ours = np.clip(r.image()[:, ::-1, :] / 48, 0, 1)
        g = Image.fromarray((golden_image * 255).astype(np.uint8)).resize(
            (64, 64), Image.BOX
        )
        gold = np.asarray(g, np.float32) / 255.0
        mask = np.ones((64, 64), bool)
        mask[24:46, 20:44] = False  # sphere region
        d = np.abs(ours - gold)
        diff = d[mask]
        assert diff.mean() < 0.075, f"mean abs diff {diff.mean():.4f}"
        # Full-image bound (no exclusion): the sphere region (12.9% of
        # the frame) carries the proven mirror-vs-matte-golden floor of
        # ~0.11 MAD, so full MAD <= 0.871*0.075 + 0.129*(0.11 + lowspp
        # noise) ~ 0.085; measured 0.065 at 48 spp. A shading/golden
        # regression anywhere in the frame — sphere included — trips it.
        assert d.mean() < 0.095, f"full-image mean abs diff {d.mean():.4f}"
        # color structure: left wall red-dominant, right wall green-dominant
        assert ours[28:36, 2:6, 0].mean() > 1.5 * ours[28:36, 2:6, 1].mean()
        assert ours[28:36, 58:62, 1].mean() > 1.5 * ours[28:36, 58:62, 0].mean()


class TestToggles:
    """Compaction and material sort must be radiometrically neutral —
    bit-identical images since our RNG keys on pixelIndex (ops/rng.py)."""

    def test_sort_by_material_neutral(self, cornell_scene):
        base = render_small(cornell_scene, 3).image()
        sorted_ = render_small(cornell_scene, 3, sort_by_material=True).image()
        np.testing.assert_allclose(base, sorted_, atol=1e-5)

    def test_compact_neutral(self, cornell_scene):
        base = render_small(cornell_scene, 3).image()
        compacted = render_small(cornell_scene, 3, compact=True).image()
        np.testing.assert_allclose(base, compacted, atol=1e-5)

    def test_both_neutral(self, cornell_scene):
        base = render_small(cornell_scene, 3).image()
        both = render_small(
            cornell_scene, 3, compact=True, sort_by_material=True
        ).image()
        np.testing.assert_allclose(base, both, atol=1e-5)

    def test_first_bounce_cache_neutral(self, cornell_scene):
        """Cache reuses depth-0 intersections across iterations; with a
        deterministic pinhole camera the image must be identical
        (INSTRUCTION.md:87-89)."""
        base = render_small(cornell_scene, 3).image()
        cached = render_small(
            cornell_scene, 3, cache_first_bounce=True
        ).image()
        np.testing.assert_allclose(base, cached, atol=1e-5)

    def test_cache_disabled_under_aa(self, cornell_scene):
        """AA jitter must disable the cache (INSTRUCTION.md:112-113)."""
        s = RenderSettings(cache_first_bounce=True, antialias=True)
        assert not s.effective_cache()

    def test_antialias_still_converges(self, cornell_scene):
        r = render_small(cornell_scene, 16, antialias=True)
        img = r.image() / 16
        assert img.max() > 0.5
        assert np.isfinite(img).all()


class TestCameraReset:
    def test_camera_change_resets(self, cornell_scene):
        r = render_small(cornell_scene, 3)
        assert r.iteration == 3
        r.orbit_camera(dphi=0.3)
        assert r.iteration == 0
        assert float(np.abs(r.image()).max()) == 0.0

    def test_orbit_identity_keeps_position(self, cornell_scene):
        r = render_small(cornell_scene, 1)
        pos_before = r.camera.position.copy()
        r.orbit_camera()  # no deltas
        np.testing.assert_allclose(r.camera.position, pos_before, atol=1e-4)


class TestSaveContract:
    def test_filename_and_flip(self, cornell_scene, tmp_path):
        r = render_small(cornell_scene, 2)
        path = r.save(out_dir=str(tmp_path))
        name = os.path.basename(path)
        # {FILE}.{timestamp}.{N}samp.png per src/main.cpp:91-97
        assert name.startswith("cornell.")
        assert name.endswith(".2samp.png")
        from PIL import Image

        saved = np.asarray(Image.open(path), np.uint8)
        assert saved.shape == (32, 32, 3)
        # x-flip: saved[:, x] == tonemap(accum)[:, W-1-x]
        accum = r.image() / 2
        expect = np.clip(accum[:, ::-1, :] * 255, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(saved, expect)

    def test_hdr_save(self, cornell_scene, tmp_path):
        r = render_small(cornell_scene, 2)
        path = r.save(out_dir=str(tmp_path), hdr=True)
        assert path.endswith(".hdr")
        import imageio.v3 as iio

        data = iio.imread(path)
        assert data.shape == (32, 32, 3)

    def test_checkpoint_roundtrip(self, cornell_scene, tmp_path):
        r = render_small(cornell_scene, 3)
        ck = str(tmp_path / "ck.npz")
        r.save_checkpoint(ck)
        r2 = Renderer(
            make_small_cornell(cornell_scene, (32, 32)),
            RenderSettings(trace_depth=8, use_bvh=False),
        )
        r2.load_checkpoint(ck)
        assert r2.iteration == 3
        np.testing.assert_allclose(r2.image(), r.image())
        # resumed render continues deterministically
        r.step()
        r2.step()
        np.testing.assert_allclose(r2.image(), r.image(), atol=1e-5)

    def test_checkpoint_resume_with_first_bounce_cache(
        self, cornell_scene, tmp_path
    ):
        """Resume must not trust the zeroed cache (advisor finding r1):
        with cache_first_bounce on, the post-resume step has to rebuild
        the cache, not treat all-zeros as 'every ray missed'."""
        r = render_small(cornell_scene, 2, cache_first_bounce=True)
        ck = str(tmp_path / "ck.npz")
        r.save_checkpoint(ck)
        r2 = Renderer(
            make_small_cornell(cornell_scene, (32, 32)),
            RenderSettings(
                trace_depth=8, use_bvh=False, cache_first_bounce=True
            ),
        )
        r2.load_checkpoint(ck)
        before = r2.image().sum()
        r2.step()
        added = r2.image().sum() - before
        assert added > 0.0, "post-resume step contributed zero radiance"
        # and it must match the uninterrupted render exactly
        r.step()
        np.testing.assert_allclose(r2.image(), r.image(), atol=1e-5)


class TestTonemap:
    def test_uint8_range_and_truncation(self, cornell_scene):
        r = render_small(cornell_scene, 2)
        frame = r.frame_uint8()
        assert frame.dtype == np.uint8
        assert frame.shape == (32, 32, 3)
        accum = r.image()
        want = np.clip((accum / 2 * 255.0).astype(np.int32), 0, 255)
        np.testing.assert_array_equal(frame, want.astype(np.uint8))


class TestTpuMeshGuard:
    """The XLA mesh path crashes the TPU worker at large pools (round-2
    measurement); Renderer refuses it with an actionable error. On the
    CPU test backend the guard must be inert."""

    def test_guard_inert_on_cpu(self, cornell_scene):
        import os

        from project3_cuda_path_tracer_tpu.models.scene import load_scene
        from tests.conftest import SCENES

        scene = load_scene(os.path.join(SCENES, "mesh.txt"))
        # full 800x800 mesh scene without pallas: fine on CPU
        Renderer(scene, RenderSettings(trace_depth=2, use_pallas=False))

    def test_guard_logic_matches_megakernel_eligibility(self, cornell_scene):
        """Simulate the TPU platform check by calling the guard with a
        monkeypatched platform: eligible configs pass, big XLA-path
        configs raise."""
        import os
        from unittest import mock

        from project3_cuda_path_tracer_tpu.models.scene import load_scene
        from tests.conftest import SCENES

        scene = load_scene(os.path.join(SCENES, "mesh.txt"))  # 800x800

        class FakeDev:
            platform = "tpu"

        with mock.patch("jax.devices", return_value=[FakeDev()]):
            # megakernel-eligible: fine
            Renderer(scene, RenderSettings(trace_depth=2, use_pallas=True))
            # XLA path at 800x800: refused
            with pytest.raises(RuntimeError, match="XLA mesh path"):
                Renderer(scene, RenderSettings(trace_depth=2, use_pallas=False))
            # override respected
            os.environ["PT_TPU_ALLOW_XLA_MESH"] = "1"
            try:
                Renderer(
                    scene, RenderSettings(trace_depth=2, use_pallas=False)
                )
            finally:
                del os.environ["PT_TPU_ALLOW_XLA_MESH"]
