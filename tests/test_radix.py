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
        "expand,pack64,compact,radix,spill,cull,pipe,defer", [
            # pipe rows keep the 3-slot DMA pipeline covered (measured
            # a wash on hardware, kept as the recorded experiment);
            # legacy-block-loop rows cover the shipping default.
            (1, True, False, False, False, False, True, False),
            (4, True, False, False, False, False, False, False),
            (4, False, False, False, False, False, True, False),
            (4, False, True, False, False, False, True, False),
            (1, False, True, False, False, False, False, False),
            # ONE radix param: the machinery has its own unit test
            # (test_global_radix_matches_stable_argsort) and each radix
            # pipeline param costs ~20 min of interpret-mode suite time.
            (4, False, True, True, False, False, True, False),
            # SORT_SPILL: first-super phase A + bounded spill phase B
            # must reproduce the one-round stream bit-exactly. expand=2
            # makes phase B a single-slot tail (the overflow-heavy
            # shape); expand=4 is the in-window shape.
            (4, False, True, False, True, False, True, False),
            (2, False, False, False, True, False, True, False),
            # SWEEP_CULL: per-chunk slab-cull inside the window sweep
            # must skip only chunks no lane can win — bit-identical
            # output. expand=1 also exercises culling in the
            # prefix-window tail.
            (4, False, True, False, False, True, True, False),
            (1, False, False, False, False, True, True, False),
            # SWEEP_DEFER: the deferred one-hot attribute fetch must be
            # bit-identical — (row, pos, u, v) carry + post-sweep MXU
            # gather + the same interpolation expression. expand=1
            # exercises the fetch in the prefix-window tail (multi-
            # super programs); the cull row composes both sweeps.
            (4, False, True, False, False, False, False, True),
            (1, False, False, False, False, False, False, True),
            (4, False, True, False, False, True, False, True),
        ])
    def test_bit_identical_with_sorting_forced(self, monkeypatch,
                                               expand, pack64, compact,
                                               radix, spill, cull,
                                               pipe, defer):
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
        monkeypatch.setattr(pipeline, "SWEEP_DEFER", defer)
        monkeypatch.setattr(pipeline, "SORT_SUPER_MIN_TRIS", 2**31)
        plain = run()
        monkeypatch.setattr(pipeline, "SORT_SUPER_MIN_TRIS", 0)
        srt = run()
        if not defer:
            jax.tree.map(np.testing.assert_array_equal, plain, srt)
        else:
            # Deferred-fetch rows: the fetched attributes and carried
            # u/v are exact (the one-hot gather is bit-exact — see
            # _attr_fetch's unit test below), but INTERPRET mode
            # compiles the post-fetch interpolation in a different
            # XLA:CPU graph context than _mt_chunk's inline fold and
            # FMA-contracts them differently — a ~1-ulp normal diff on
            # ~0.1% of lanes that the scatter math amplifies to ~1e-6
            # relative in the bounced directions. On HARDWARE Mosaic
            # lowers both contexts literally and the sorted-defer
            # render is bit-identical to dense (tools/ab_bigmesh.py
            # --defer-ab, max|d|=0 — docs/ANALYSIS.md round 5).
            def near(a, b):
                np.testing.assert_allclose(a, b, rtol=3e-6, atol=3e-7)
                d = np.asarray(a) != np.asarray(b)
                assert d.mean() < 0.005, (
                    f"defer ulp-class exceeded: {d.mean():.4%} lanes"
                )
            jax.tree.map(near, plain, srt)


@pytest.mark.parametrize("expand", [4, 1])
def test_packwin_bit_identical(monkeypatch, expand):
    """SWEEP_PACKWIN (the 4*row+pos packed defer carry) must be
    BIT-identical to the unpacked (row, pos) carry — in interpret
    mode too, unlike the defer-vs-inline rows above: the packed word
    is an exact integer f32, the floor/mul unpack reproduces
    brow/bpos exactly, and both sides run the SAME post-fetch
    interpolation graph (no FMA-contraction asymmetry). expand=1
    routes multi-super lanes through the prefix-window tail program;
    expand=4 is the shipping in-window shape."""
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
    monkeypatch.setattr(pipeline, "SORT_COMPACT", expand == 4)
    monkeypatch.setattr(pipeline, "SWEEP_DEFER", True)
    monkeypatch.setattr(pipeline, "SORT_SUPER_MIN_TRIS", 0)
    monkeypatch.setattr(pipeline, "SWEEP_PACKWIN", False)
    plain = run()
    monkeypatch.setattr(pipeline, "SWEEP_PACKWIN", True)
    packed = run()
    jax.tree.map(np.testing.assert_array_equal, plain, packed)


def test_attr_fetch_bit_exact():
    """The deferred window sweep's one-hot attribute gather
    (ops/megakernel._attr_fetch over models/device.py mesh_attr_slabs)
    must return the EXACT f32 table attributes for every (row, pos):
    bf16 one-hot x bf16 split parts accumulate one nonzero per slot in
    f32, and (hi + mid) + lo reconstructs the significand exactly
    (_split3_bf16). Random (row, pos) per lane, compared bit-for-bit
    against the packed tri table's cols 9-23."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from project3_cuda_path_tracer_tpu.models.device import (
        scene_to_device,
    )
    from project3_cuda_path_tracer_tpu.models.scene import load_scene
    from project3_cuda_path_tracer_tpu.ops.megakernel import (
        TRI_ROW,
        _attr_fetch,
    )

    here = os.path.join(os.path.dirname(__file__), "..", "scenes")
    dev = scene_to_device(
        load_scene(os.path.join(here, "mesh.txt")), use_bvh=False
    )
    table = np.asarray(dev.mesh_tri_table)
    slabs = dev.mesh_attr_slabs
    SR = slabs.shape[2]
    rng = np.random.default_rng(7)
    s = 2  # an interior super (single mesh geom: rows s*SR onward)
    brow = rng.integers(0, SR, (8, LANE)).astype(np.float32)
    bpos = rng.integers(0, TRI_ROW, (8, LANE)).astype(np.float32)

    def kern(slab_ref, br_ref, bp_ref, *outs):
        fat = _attr_fetch(slab_ref[:], br_ref[:], bp_ref[:], True)
        for o, f in zip(outs, fat):
            o[:] = f

    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((8, LANE), jnp.float32)] * 15,
        interpret=True,
    )(slabs[s], jnp.asarray(brow), jnp.asarray(bpos))
    flat = table.reshape(-1, TRI_ROW, 24)
    for j in range(15):
        ref = flat[s * SR + brow.astype(int), bpos.astype(int), 9 + j]
        np.testing.assert_array_equal(ref, np.asarray(outs[j]))
