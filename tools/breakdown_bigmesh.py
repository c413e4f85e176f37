"""Per-stage cost breakdown of the sorted big-mesh traversal on TPU.

Usage: python tools/breakdown_bigmesh.py [scene.txt]

Times whole frames (800x800, scene depth) under PT_TPU_SORT_ABLATE
timing probes and reports each sorted-path stage by subtraction:

  sort1p = full - nosort1                  (the payload operands; the
                                            key sort itself stays)
  sort2  = full - nosort2
  rank   = nosweep - (nosweep+norank)      (windows don't matter once
                                            the sweep is ablated)
  sweep ~= full - sort1p - sort2 - rank - base, base ~= nosweep+norank

CAVEAT (measured round 3c): `full - nosweep` OVERSTATES the sweep —
once qstk is unused XLA's sort-operand simplifier DCEs the q payloads
out of sort1, so the nosweep config also drops most of sort1's cost
(the naive 5-term subtraction gave rest = -34%). The sort1p/sort2/rank
deltas are clean: sort networks are data-independent and those probes
keep the real sorted keys for the window bounds (norank is only ever
paired with nosweep). Images under probes are WRONG — this harness
never checks them. ONE TPU process at a time (CLAUDE.md).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from project3_cuda_path_tracer_tpu.models.scene import (  # noqa: E402
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
N = 10


def timed_frame(ablate):
    pipeline.SORT_ABLATE = frozenset(ablate)
    jax.clear_caches()
    scene = load_scene(os.path.join(REPO, "scenes", SCENE))
    depth = scene.state.trace_depth or 8
    r = Renderer(
        scene,
        RenderSettings(trace_depth=depth, use_pallas=True,
                       use_bvh=False),
    )
    r.step_batch(N)  # warm/compile this exact batch size
    float(jnp.sum(r.accum.x))  # flush tunnel
    t0 = time.perf_counter()
    r.step_batch(N)
    float(jnp.sum(r.accum.x))
    dt = (time.perf_counter() - t0) / N
    cam = scene.state.camera
    px = int(cam.resolution[0]) * int(cam.resolution[1])
    return dt, px * depth


CONFIGS = [
    ("full", ()),
    ("nosweep", ("nosweep",)),
    ("nosweep+norank", ("nosweep", "norank")),
    ("nosort1", ("nosort1",)),
    ("nosort2", ("nosort2",)),
]

t = {}
for name, flags in CONFIGS:
    dt, rays = timed_frame(flags)
    t[name] = dt
    print(f"[{SCENE}] {name}: {dt*1e3:.1f} ms/frame "
          f"{rays/dt/1e6:.1f} Mrays/s", flush=True)

full = t["full"]
rank = t["nosweep"] - t["nosweep+norank"]
sort1p = full - t["nosort1"]
sort2 = full - t["nosort2"]
base = t["nosweep+norank"]  # K1/K2/K3 + merge + epilogue (approx)
sweep = full - sort1p - sort2 - rank - base
print(f"\n[{SCENE}] stage breakdown (ms/frame of {full*1e3:.1f}):")
for name, v in [("sort1 payloads", sort1p), ("sort2 (unsort)", sort2),
                ("rank fori", rank),
                ("window sweep (residual, incl key sort)", sweep),
                ("base K1/K2/K3/merge (~nosweep+norank)", base)]:
    print(f"  {name:40s} {v*1e3:7.1f}  ({100*v/full:5.1f}%)")
