"""A/B the sorted-stream (pair-expansion) big-mesh traversal on TPU.

Usage: python tools/ab_bigmesh.py [scene.txt] [--no-check] [--sweep]

For the scene (default mesh_big.txt): correctness at 256x256 (sorted
vs dense must match bit-near-exactly — the expansion is per-lane-exact
by construction), then timed 800x800 frames for the dense baseline and
the sorted path; --sweep additionally tries SORT_EXPAND in {2, 4, 6}.
ONE TPU process at a time (CLAUDE.md).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from project3_cuda_path_tracer_tpu.models.scene import (  # noqa: E402
    derive_camera,
    load_scene,
)
from project3_cuda_path_tracer_tpu.render import (  # noqa: E402
    Renderer,
    RenderSettings,
)
from project3_cuda_path_tracer_tpu.ops import pipeline  # noqa: E402

SCENE = next(
    (a for a in sys.argv[1:] if not a.startswith("--")), "mesh_big.txt"
)


def make_renderer(res):
    scene = load_scene(f"/root/repo/scenes/{SCENE}")
    c0 = scene.state.camera
    if res is not None:
        scene.state.camera = derive_camera(
            (res, res), c0.position, c0.look_at,
            np.array([0, 1, 0], np.float32), float(c0.fov[1]),
        )
    depth = scene.state.trace_depth or 8
    r = Renderer(
        scene,
        RenderSettings(trace_depth=depth, use_pallas=True,
                       use_bvh=False),
    )
    return r, depth


def image(r):
    acc = r.accum
    out = np.stack(
        [np.asarray(acc.x), np.asarray(acc.y), np.asarray(acc.z)], -1
    )
    return out / max(r.iteration, 1)


def run_mode(sort_on, res, n, timed=False, expand=None, compact=None,
             radix=None, super_chunks=None, spill=None, cull=None,
             pipe=None, defer=None, packwin=None):
    pipeline.SORT_SUPER_MIN_TRIS = 16384 if sort_on else 2**31
    if expand is not None:
        pipeline.SORT_EXPAND = expand
    if compact is not None:
        pipeline.SORT_COMPACT = compact
    if radix is not None:
        pipeline.SORT_RADIX = radix
    if spill is not None:
        pipeline.SORT_SPILL = spill
    if cull is not None:
        pipeline.SWEEP_CULL = cull
    if pipe is not None:
        pipeline.SWEEP_PIPE = pipe
    if defer is not None:
        pipeline.SWEEP_DEFER = defer
    if packwin is not None:
        pipeline.SWEEP_PACKWIN = packwin
    if super_chunks is not None:
        # tris/super = super_chunks * MESH_CHUNK(=32); every user
        # imports MESH_SUPER at call time, so a module poke applies
        # to the fresh renderer below (tables rebuilt per renderer).
        from project3_cuda_path_tracer_tpu.ops import megakernel
        megakernel.MESH_SUPER = super_chunks
    jax.clear_caches()
    r, depth = make_renderer(res)
    r.step_batch(n)  # warm/compile this exact batch size
    float(jnp.sum(r.accum.x))  # flush tunnel
    if not timed:
        return image(r), None, depth
    t0 = time.perf_counter()
    r.step_batch(n)
    float(jnp.sum(r.accum.x))
    dt = (time.perf_counter() - t0) / n
    return image(r), dt, depth


if "--no-check" not in sys.argv:
    img_off, _, _ = run_mode(False, 256, 4)
    img_on, _, _ = run_mode(True, 256, 4)
    d = np.abs(img_off - img_on)
    print(f"[{SCENE}] correctness 256x256 4spp: max|d|={d.max():.3e} "
          f"mean|d|={d.mean():.3e} frac>1e-3={(d > 1e-3).mean():.5f}",
          flush=True)

if "--compact-ab" in sys.argv:
    # A/B the SORT_COMPACT dead-entry drop: correctness (compacted
    # sorted vs dense at 256x256), then timed sorted with/without.
    img_off, _, _ = run_mode(False, 256, 4, compact=False)
    img_on, _, _ = run_mode(True, 256, 4, compact=True)
    d = np.abs(img_off - img_on)
    print(f"[{SCENE}] compact correctness 256x256 4spp: "
          f"max|d|={d.max():.3e} mean|d|={d.mean():.3e}", flush=True)
    for comp in (False, True):
        _, dt, depth = run_mode(True, None, 10, timed=True,
                                compact=comp)
        print(f"[{SCENE}] sorted compact={int(comp)}: "
              f"{dt*1e3:.1f} ms/frame  "
              f"{800*800*depth/dt/1e6:.1f} Mrays/s", flush=True)
    sys.exit(0)

if "--radix-ab" in sys.argv:
    # A/B the global binary-radix sort (SORT_RADIX, requires
    # SORT_COMPACT): correctness (radix sorted vs dense at 256x256),
    # then timed sorted bitonic vs radix.
    img_off, _, _ = run_mode(False, 256, 4, compact=True, radix=False)
    img_on, _, _ = run_mode(True, 256, 4, compact=True, radix=True)
    d = np.abs(img_off - img_on)
    print(f"[{SCENE}] radix correctness 256x256 4spp: "
          f"max|d|={d.max():.3e} mean|d|={d.mean():.3e}", flush=True)
    for rad in (False, True):
        _, dt, depth = run_mode(True, None, 10, timed=True,
                                compact=True, radix=rad)
        print(f"[{SCENE}] sorted compact=1 radix={int(rad)}: "
              f"{dt*1e3:.1f} ms/frame  "
              f"{800*800*depth/dt/1e6:.1f} Mrays/s", flush=True)
    sys.exit(0)

if "--spill-ab" in sys.argv:
    # A/B the first-super + bounded-spill split (SORT_SPILL):
    # correctness (spill sorted vs dense at 256x256), then timed
    # sorted without/with the split (compacted bitonic both sides).
    img_off, _, _ = run_mode(False, 256, 4, compact=True, spill=False)
    img_on, _, _ = run_mode(True, 256, 4, compact=True, spill=True)
    d = np.abs(img_off - img_on)
    print(f"[{SCENE}] spill correctness 256x256 4spp: "
          f"max|d|={d.max():.3e} mean|d|={d.mean():.3e}", flush=True)
    for sp in (False, True):
        _, dt, depth = run_mode(True, None, 10, timed=True,
                                compact=True, spill=sp)
        print(f"[{SCENE}] sorted compact=1 spill={int(sp)}: "
              f"{dt*1e3:.1f} ms/frame  "
              f"{800*800*depth/dt/1e6:.1f} Mrays/s", flush=True)
    sys.exit(0)

if "--pipe-ab" in sys.argv:
    # A/B the window sweep's 3-slot software pipeline (SWEEP_PIPE):
    # correctness (piped sorted vs dense at 256x256 AND — the
    # isolation leg — sorted pipe=0 vs sorted pipe=1, expected
    # max|d|=0 since pipelining must not change a single bit of the
    # sweep), then timed sorted legacy-sync vs piped (compacted
    # bitonic both sides).
    img_dense, _, _ = run_mode(False, 256, 4, compact=True, pipe=False)
    img_off, _, _ = run_mode(True, 256, 4, compact=True, pipe=False)
    img_on, _, _ = run_mode(True, 256, 4, compact=True, pipe=True)
    d = np.abs(img_dense - img_on)
    di = np.abs(img_off - img_on)
    print(f"[{SCENE}] pipe correctness 256x256 4spp: "
          f"vs dense max|d|={d.max():.3e} mean|d|={d.mean():.3e}  "
          f"sorted pipe0-vs-pipe1 max|d|={di.max():.3e} "
          f"(expect 0)", flush=True)
    for pp in (False, True):
        _, dt, depth = run_mode(True, None, 10, timed=True,
                                compact=True, pipe=pp)
        print(f"[{SCENE}] sorted compact=1 pipe={int(pp)}: "
              f"{dt*1e3:.1f} ms/frame  "
              f"{800*800*depth/dt/1e6:.1f} Mrays/s", flush=True)
    sys.exit(0)

if "--defer-ab" in sys.argv:
    # A/B the deferred attribute fetch (SWEEP_DEFER): correctness
    # (deferred sorted vs dense at 256x256 AND the isolation leg
    # sorted defer=0 vs defer=1 — both expected max|d|=0 on hardware:
    # Mosaic lowers the interpolation literally in both contexts),
    # then timed sorted inline-fold vs deferred-fetch.
    img_dense, _, _ = run_mode(False, 256, 4, compact=True,
                               defer=False)
    img_off, _, _ = run_mode(True, 256, 4, compact=True, defer=False)
    img_on, _, _ = run_mode(True, 256, 4, compact=True, defer=True)
    d = np.abs(img_dense - img_on)
    di = np.abs(img_off - img_on)
    print(f"[{SCENE}] defer correctness 256x256 4spp: "
          f"vs dense max|d|={d.max():.3e} mean|d|={d.mean():.3e}  "
          f"sorted defer0-vs-defer1 max|d|={di.max():.3e} "
          f"(expect 0)", flush=True)
    for df in (False, True):
        _, dt, depth = run_mode(True, None, 10, timed=True,
                                compact=True, defer=df)
        print(f"[{SCENE}] sorted compact=1 defer={int(df)}: "
              f"{dt*1e3:.1f} ms/frame  "
              f"{800*800*depth/dt/1e6:.1f} Mrays/s", flush=True)
    sys.exit(0)

if "--packwin-ab" in sys.argv:
    # A/B the packed (row,pos) defer carry (SWEEP_PACKWIN):
    # correctness (packed sorted vs dense at 256x256 AND the
    # isolation leg sorted packwin=0 vs packwin=1 — both expected
    # max|d|=0: the packed word is an exact integer f32 and the
    # floor/mul unpack reproduces brow/bpos bit-identically), then
    # timed sorted 5-select vs 4-select (deferred fetch both sides).
    img_dense, _, _ = run_mode(False, 256, 4, compact=True,
                               defer=True, packwin=False)
    img_off, _, _ = run_mode(True, 256, 4, compact=True,
                             defer=True, packwin=False)
    img_on, _, _ = run_mode(True, 256, 4, compact=True,
                            defer=True, packwin=True)
    d = np.abs(img_dense - img_on)
    di = np.abs(img_off - img_on)
    print(f"[{SCENE}] packwin correctness 256x256 4spp: "
          f"vs dense max|d|={d.max():.3e} mean|d|={d.mean():.3e}  "
          f"sorted packwin0-vs-packwin1 max|d|={di.max():.3e} "
          f"(expect 0)", flush=True)
    for pw in (False, True):
        _, dt, depth = run_mode(True, None, 10, timed=True,
                                compact=True, defer=True, packwin=pw)
        print(f"[{SCENE}] sorted compact=1 defer=1 packwin={int(pw)}: "
              f"{dt*1e3:.1f} ms/frame  "
              f"{800*800*depth/dt/1e6:.1f} Mrays/s", flush=True)
    sys.exit(0)

if "--cull-ab" in sys.argv:
    # A/B in-sweep chunk-AABB culling (SWEEP_CULL): correctness (cull
    # sorted vs dense at 256x256), then timed sorted without/with the
    # per-chunk lax.cond skip (compacted bitonic both sides).
    img_off, _, _ = run_mode(False, 256, 4, compact=True, cull=False)
    img_on, _, _ = run_mode(True, 256, 4, compact=True, cull=True)
    d = np.abs(img_off - img_on)
    print(f"[{SCENE}] cull correctness 256x256 4spp: "
          f"max|d|={d.max():.3e} mean|d|={d.mean():.3e}", flush=True)
    for cu in (False, True):
        _, dt, depth = run_mode(True, None, 10, timed=True,
                                compact=True, cull=cu)
        print(f"[{SCENE}] sorted compact=1 cull={int(cu)}: "
              f"{dt*1e3:.1f} ms/frame  "
              f"{800*800*depth/dt/1e6:.1f} Mrays/s", flush=True)
    sys.exit(0)

if "--super-ab" in sys.argv:
    # Sweep supernode size (tris/super = chunks*32): smaller supers
    # shrink the window sweep's per-entry tri work ~linearly but grow
    # the expanded/sorted stream (rays enter more supers — E rises
    # with them). Correctness for each config vs the default-super
    # dense sweep, then timed. Radix measured negative (see
    # --radix-ab), so bitonic only.
    img_ref, _, _ = run_mode(False, 256, 4)
    for sc, E in ((16, 6), (16, 8), (8, 8)):
        img, _, _ = run_mode(True, 256, 4, compact=True,
                             expand=E, super_chunks=sc)
        d = np.abs(img_ref - img)
        _, dt, depth = run_mode(True, None, 10, timed=True,
                                compact=True, expand=E,
                                super_chunks=sc)
        print(f"[{SCENE}] super={sc*32}tris E={E}: "
              f"{dt*1e3:.1f} ms/frame  "
              f"{800*800*depth/dt/1e6:.1f} Mrays/s  "
              f"max|d|={d.max():.3e}", flush=True)
    sys.exit(0)

expands = [2, 4, 6] if "--sweep" in sys.argv else [None]
for a in sys.argv[1:]:
    if a.startswith("--expands="):
        expands = [int(x) for x in a.split("=", 1)[1].split(",")]
if "--no-dense" not in sys.argv:
    _, dt, depth = run_mode(False, None, 10, timed=True)
    print(f"[{SCENE}] dense: {dt*1e3:.1f} ms/frame  "
          f"{800*800*depth/dt/1e6:.1f} Mrays/s", flush=True)
for e in expands:
    _, dt, depth = run_mode(True, None, 10, timed=True, expand=e)
    tag = f"sorted E={e}" if e else "sorted"
    print(f"[{SCENE}] {tag}: {dt*1e3:.1f} ms/frame  "
          f"{800*800*depth/dt/1e6:.1f} Mrays/s", flush=True)
