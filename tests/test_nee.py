"""NEE-at-every-bounce with MIS tests (VERDICT r1 #6; extends
INSTRUCTION.md:117-118 beyond final-bounce-only).

Semantics under test (see render._nee_mis_bounce):
- unbiasedness: nee(D) integrates the same path space as brute(D+1)
  on an all-diffuse scene (the final light connection adds a segment),
- variance: large MSE win at equal spp on Cornell,
- MIS bookkeeping: direct light view, specular lanes untouched by NEE.
"""

import copy

import numpy as np
import pytest

from project3_cuda_path_tracer_tpu.render import Renderer, RenderSettings
from tests.conftest import make_small_cornell


def _render(scene, spp, depth, start=0, **kw):
    r = Renderer(
        scene, RenderSettings(trace_depth=depth, use_bvh=False, **kw)
    )
    r.iteration = start
    r.step_batch(spp)
    return r.image() / spp


@pytest.fixture(scope="module")
def diffuse_cornell(cornell_scene):
    """Cornell with the mirror sphere made diffuse: nee(D) == brute(D+1)
    exactly in expectation (no specular tails)."""
    s = copy.copy(cornell_scene)
    s.materials = copy.deepcopy(cornell_scene.materials)
    s.materials.has_reflective[4] = 0.0
    return make_small_cornell(s, (16, 16))


class TestUnbiased:
    def test_matches_brute_force_plus_one_bounce(self, diffuse_cornell):
        """nee(4) vs high-spp brute(5) truth: signed error within the
        noise floor (measured -0.0006 at 1024 spp on depth 5/6)."""
        truth = _render(diffuse_cornell, 8192, 5, start=500000)
        nee = _render(diffuse_cornell, 768, 4, nee_mis=True)
        assert abs(float((nee - truth).mean())) < 0.004
        assert float(np.abs(nee - truth).mean()) < 0.015

    def test_direct_light_view_unchanged(self, cornell_scene):
        """Camera rays that hit the light must show full emission (MIS
        weight 1 at depth 0 — no previous diffuse vertex)."""
        scene = make_small_cornell(cornell_scene, (16, 16))
        nee = _render(scene, 16, 6, nee_mis=True)
        brute = _render(scene, 16, 6)
        # light region: directly-viewed emitter pixels are exactly
        # RGB(1,1,1) * EMITTANCE 5 every sample
        light_mask = brute.mean(axis=-1) > 4.9
        assert light_mask.any()
        np.testing.assert_allclose(
            nee[light_mask], brute[light_mask], rtol=1e-5
        )


class TestVariance:
    def test_large_mse_win_at_equal_spp(self, cornell_scene):
        """Measured: MSE 0.00106 (nee) vs 0.00511 (brute) at 64 spp vs
        an independent reference — require at least 2x."""
        scene = make_small_cornell(cornell_scene, (16, 16))
        ref = _render(scene, 2048, 6, start=100000, nee_mis=True)
        mse_brute = float(((_render(scene, 64, 6) - ref) ** 2).mean())
        mse_nee = float(
            ((_render(scene, 64, 6, nee_mis=True) - ref) ** 2).mean()
        )
        assert mse_nee < 0.5 * mse_brute, (
            f"nee {mse_nee:.6f} vs brute {mse_brute:.6f}"
        )

    def test_composes_with_rr_and_stratified(self, cornell_scene):
        scene = make_small_cornell(cornell_scene, (16, 16))
        img = _render(
            scene, 32, 6,
            nee_mis=True, russian_roulette=True, stratified=True,
        )
        assert np.isfinite(img).all() and img.max() > 0.5

    def test_rejects_sort_and_compact(self, cornell_scene):
        scene = make_small_cornell(cornell_scene, (16, 16))
        with pytest.raises(ValueError, match="nee_mis"):
            _render(scene, 1, 4, nee_mis=True, compact=True)


@pytest.fixture(scope="module")
def glossy_cornell(cornell_scene):
    """Cornell with the sphere made Phong-glossy (REFL=1, SPECEX=32):
    round 3 extends NEE to every non-delta lobe, so glossy vertices now
    take MIS-weighted light samples too (VERDICT r2 next #5)."""
    s = copy.copy(cornell_scene)
    s.materials = copy.deepcopy(cornell_scene.materials)
    s.materials.has_reflective[4] = 1.0
    s.materials.specular_exponent[4] = 32.0
    s.materials.specular_color[4] = [0.9, 0.9, 0.9]
    return make_small_cornell(s, (16, 16))


class TestGlossyNee:
    def test_glossy_unbiased_vs_brute(self, glossy_cornell):
        """nee(4) on the glossy scene vs a high-spp brute(5) truth:
        glossy NEE must not shift the mean (the mixed-BRDF weighting
        integrates the same paths the lobe sampler does)."""
        ref = _render(glossy_cornell, 1536, 5)
        nee = _render(glossy_cornell, 384, 4, start=5000, nee_mis=True)
        err = float((nee - ref).mean())
        mad_ref = float(np.abs(ref).mean())
        assert abs(err) < 0.02 * max(mad_ref, 1.0), (
            f"signed error {err:.5f} vs reference mean {mad_ref:.4f}"
        )

    def test_glossy_variance_win(self, glossy_cornell):
        """The point of glossy NEE: lower MSE at equal spp on the
        glossy sphere region."""
        ref = _render(glossy_cornell, 1536, 5)
        brute = _render(glossy_cornell, 96, 5, start=9000)
        nee = _render(glossy_cornell, 96, 4, start=11000, nee_mis=True)
        mse_brute = float(((brute - ref) ** 2).mean())
        mse_nee = float(((nee - ref) ** 2).mean())
        assert mse_nee < mse_brute, (
            f"nee {mse_nee:.6f} vs brute {mse_brute:.6f}"
        )
