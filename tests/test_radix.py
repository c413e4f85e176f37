"""Exactness tests for the in-tile binary-radix sort built on the
compaction network (ops/pipeline.py::_radix_sort_tile/_radix_unsort_tile)
— the big-mesh candidate reordering (docs/ROADMAP.md round-4 plan).

Same harness as tests/test_compaction.py: interpret-mode pallas_call;
tools/tpu_validate_compaction.py runs the identical checks compiled on
hardware (Mosaic bugs do not reproduce in interpret mode — CLAUDE.md).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from project3_cuda_path_tracer_tpu.ops.pipeline import (
    _radix_sort_tile,
    _radix_unsort_tile,
)

ROWS, LANE = 64, 128


def _sort_roundtrip(keys, arrays, bits, interpret=True):
    n = len(arrays)

    def kernel(key_ref, *refs):
        in_refs = refs[:n]
        key_out = refs[n]
        sorted_refs = refs[n + 1 : 2 * n + 1]
        un_refs = refs[2 * n + 1 :]
        keyf = key_ref[:]
        arrs = [r[:] for r in in_refs]
        srt, stages = _radix_sort_tile(keyf, arrs + [keyf], bits)
        for sr, s in zip(sorted_refs, srt[:-1]):
            sr[:] = s
        key_out[:] = srt[-1]
        back = _radix_unsort_tile(srt[:-1], stages)
        for ur, u in zip(un_refs, back):
            ur[:] = u

    shape = jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        out_shape=[shape] * (2 * n + 1),
        interpret=interpret,
    )(keys, *arrays)
    return outs[0], outs[1 : n + 1], outs[n + 1 :]


@pytest.mark.parametrize("n_keys,bits", [(50, 6), (80, 7), (3, 2)])
def test_radix_sort_matches_stable_argsort(n_keys, bits):
    rng = np.random.default_rng(n_keys)
    keys_np = rng.integers(0, n_keys + 1, (ROWS, LANE)).astype(np.float32)
    arrays_np = [
        rng.standard_normal((ROWS, LANE)).astype(np.float32)
        for _ in range(3)
    ]
    key_sorted, sorted_arrays, unsorted = _sort_roundtrip(
        jnp.asarray(keys_np), [jnp.asarray(a) for a in arrays_np], bits
    )
    perm = np.argsort(keys_np.reshape(-1), kind="stable")
    np.testing.assert_array_equal(
        np.asarray(key_sorted).reshape(-1), keys_np.reshape(-1)[perm]
    )
    for got, src in zip(sorted_arrays, arrays_np):
        np.testing.assert_array_equal(
            np.asarray(got).reshape(-1), src.reshape(-1)[perm]
        )
    # the unsort is the EXACT inverse (bit-identical round trip)
    for got, src in zip(unsorted, arrays_np):
        np.testing.assert_array_equal(np.asarray(got), src)


def test_radix_sort_uniform_keys_is_identity():
    keys = jnp.zeros((ROWS, LANE), jnp.float32)
    arrays = [
        jnp.arange(ROWS * LANE, dtype=jnp.float32).reshape(ROWS, LANE)
    ]
    _, sorted_arrays, unsorted = _sort_roundtrip(keys, arrays, 6)
    np.testing.assert_array_equal(np.asarray(sorted_arrays[0]), arrays[0])
    np.testing.assert_array_equal(np.asarray(unsorted[0]), arrays[0])


@pytest.mark.parametrize("n_keys,rows", [(100, 128), (7, 192)])
def test_global_radix_matches_stable_argsort(n_keys, rows):
    """The GLOBAL binary radix (_radix_sort_stream: per-tile dual
    partition + two-region stitch, XLA-orchestrated across tiles) must
    equal a stable argsort, and its structural inverse
    (_radix_unsort_stream) must round-trip payloads bit-exactly."""
    from project3_cuda_path_tracer_tpu.ops.pipeline import (
        _radix_sort_stream,
        _radix_unsort_stream,
    )

    rng = np.random.default_rng(n_keys * rows)
    keys_np = rng.integers(0, n_keys + 1, (rows, LANE)).astype(
        np.float32
    )
    pays_np = [
        rng.standard_normal((rows, LANE)).astype(np.float32)
        for _ in range(3)
    ]
    bits = max(1, int(n_keys).bit_length())
    with pltpu.force_tpu_interpret_mode():
        sorted_arrays, stages = _radix_sort_stream(
            [jnp.asarray(keys_np)] + [jnp.asarray(a) for a in pays_np],
            bits, True,
        )
        back = _radix_unsort_stream(
            [a for a in sorted_arrays[1:]], stages, True
        )
    perm = np.argsort(keys_np.reshape(-1), kind="stable")
    np.testing.assert_array_equal(
        np.asarray(sorted_arrays[0]).reshape(-1),
        keys_np.reshape(-1)[perm],
    )
    for got, src in zip(sorted_arrays[1:], pays_np):
        np.testing.assert_array_equal(
            np.asarray(got).reshape(-1), src.reshape(-1)[perm]
        )
    for got, src in zip(back, pays_np):
        np.testing.assert_array_equal(np.asarray(got), src)


class TestSortedPipelineEquivalence:
    @pytest.mark.parametrize(
        "expand,pack64,compact,radix,spill,cull,pipe", [
            # pipe=True (the shipping SWEEP_PIPE default) on most rows;
            # two rows keep the legacy synchronous block loop covered.
            (1, True, False, False, False, False, True),
            (4, True, False, False, False, False, False),
            (4, False, False, False, False, False, True),
            (4, False, True, False, False, False, True),
            (1, False, True, False, False, False, False),
            # ONE radix param: the machinery has its own unit test
            # (test_global_radix_matches_stable_argsort) and each radix
            # pipeline param costs ~20 min of interpret-mode suite time.
            (4, False, True, True, False, False, True),
            # SORT_SPILL: first-super phase A + bounded spill phase B
            # must reproduce the one-round stream bit-exactly. expand=2
            # makes phase B a single-slot tail (the overflow-heavy
            # shape); expand=4 is the in-window shape.
            (4, False, True, False, True, False, True),
            (2, False, False, False, True, False, True),
            # SWEEP_CULL: per-chunk slab-cull inside the window sweep
            # must skip only chunks no lane can win — bit-identical
            # output. expand=1 also exercises culling in the
            # prefix-window tail.
            (4, False, True, False, False, True, True),
            (1, False, False, False, False, True, True),
        ])
    def test_bit_identical_with_sorting_forced(self, monkeypatch,
                                               expand, pack64, compact,
                                               radix, spill, cull,
                                               pipe):
        """Forcing SORT_SUPER_MIN_TRIS=0 must leave the pipeline output
        bit-identical: per-lane sweep order is permutation-invariant and
        the unsort is exact. expand=1 overflows every multi-super lane
        to the single PREFIX-WINDOW TAIL program (one grid program that
        sweeps each super s2 against the start<=s2 prefix of the
        start-sorted tail entries — the overflow path); expand=4 is the
        shipping in-window config.
        pack64 covers both sort-operand layouts (s64-packed pairs vs
        plain s32 operands) — the packing is pure bitcasts and must not
        change a single ulp. compact exercises the SORT_COMPACT
        dead-entry drop (_kc_compact/_ks_stitch/_kx_expand): packing,
        stitching, sweeping the half-size stream, and routing results
        back must also be exact to the last bit. radix additionally
        replaces both lax.sorts with the linear-pass global binary
        radix (_kr_partition/_kr_stitch2/_kr_unpartition) — a stable
        LSB radix on the ascending-idx compacted stream is the
        identical permutation, and its structural inverse must
        round-trip the results bit-exactly."""
        from project3_cuda_path_tracer_tpu.models.device import (
            camera_to_device,
            scene_to_device,
        )
        from project3_cuda_path_tracer_tpu.models.scene import (
            derive_camera,
            load_scene,
        )
        from project3_cuda_path_tracer_tpu.ops import pipeline
        from project3_cuda_path_tracer_tpu.ops.vec import Vec3
        from project3_cuda_path_tracer_tpu.render import (
            RenderSettings,
            generate_rays,
        )

        scenes = os.path.join(os.path.dirname(__file__), "..", "scenes")
        scene = load_scene(os.path.join(scenes, "mesh.txt"))
        c0 = scene.state.camera
        scene.state.camera = derive_camera(
            (128, 64), c0.position, c0.look_at,
            np.array([0, 1, 0], np.float32), float(c0.fov[1]),
        )
        dev = scene_to_device(scene, use_bvh=False)
        cam = camera_to_device(scene.state.camera)
        settings = RenderSettings(trace_depth=3, use_bvh=False)
        o, d, pix = generate_rays(cam, jnp.int32(1), False, False)
        P = pix.shape[0]
        state = (o, d, Vec3.ones((P,)), Vec3.zeros((P,)),
                 jnp.ones((P,), bool), pix)

        def run():
            jax.clear_caches()
            with pltpu.force_tpu_interpret_mode():
                out = pipeline.bounce_step_pipeline(
                    state, dev, jnp.int32(1), jnp.int32(1), settings
                )
                return jax.tree.map(np.asarray, out)

        monkeypatch.setattr(pipeline, "SORT_EXPAND", expand)
        monkeypatch.setattr(pipeline, "SORT_PACK64", pack64)
        monkeypatch.setattr(pipeline, "SORT_COMPACT", compact)
        monkeypatch.setattr(pipeline, "SORT_RADIX", radix)
        monkeypatch.setattr(pipeline, "SORT_SPILL", spill)
        monkeypatch.setattr(pipeline, "SWEEP_CULL", cull)
        monkeypatch.setattr(pipeline, "SWEEP_PIPE", pipe)
        monkeypatch.setattr(pipeline, "SORT_SUPER_MIN_TRIS", 2**31)
        plain = run()
        monkeypatch.setattr(pipeline, "SORT_SUPER_MIN_TRIS", 0)
        srt = run()
        jax.tree.map(np.testing.assert_array_equal, plain, srt)
