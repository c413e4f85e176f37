"""Generate golden images for tools/smoke_pallas.py's image check.

Renders every smoke-list configuration at the smoke resolution on the
CPU XLA reference path (use_pallas=False — the estimator every Pallas
kernel is equivalence-tested against) and stores the 2-iteration mean
radiance, clipped to [0,1], as float16 in tools/goldens/smoke_<res>.npz.

Run on the CPU box whenever a smoke-list scene or the estimator
intentionally changes:

    env PYTHONPATH= JAX_PLATFORMS=cpu python tools/gen_smoke_goldens.py [res]

The check in smoke_pallas.py compares the TPU Pallas render against
these with a robust metric (fraction of clipped-space pixels off by
>0.05 must stay under 4%): the Pallas tiers are bit-equivalence-tested
per-kernel, so the only expected cross-backend diffs are intersection
seam ties (~0.4%/bounce outliers, tests/test_megakernel.py) and fma
association — a silently-wrong Mosaic lowering (the class of bug
compile smoke cannot see) blows far past the threshold.
"""

import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

SMOKE_ITERS = 2


def golden_key(name: str) -> str:
    return name.replace(" ", "_")


def render_reference(name, overrides, res):
    """One smoke config on the XLA reference path -> clipped mean frame."""
    from project3_cuda_path_tracer_tpu.models.scene import (
        derive_camera,
        load_scene,
    )
    from project3_cuda_path_tracer_tpu.render import Renderer, RenderSettings

    fname = name.split()[0]
    scene = load_scene(os.path.join("scenes", fname))
    cam = scene.state.camera
    scene.state.camera = derive_camera(
        (res, res), cam.position, cam.look_at,
        np.array([0, 1, 0], np.float32), float(cam.fov[1]),
        cam.aperture, cam.focal_distance,
    )
    settings = RenderSettings(
        trace_depth=min(scene.state.trace_depth or 8, 8),
        use_pallas=False,
        **overrides,
    )
    r = Renderer(scene, settings)
    r.step_batch(SMOKE_ITERS)
    return np.clip(r.image() / SMOKE_ITERS, 0.0, 1.0).astype(np.float16)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from smoke_pallas import SCENES

    out = {}
    for name, overrides in SCENES:
        import time

        t0 = time.perf_counter()
        out[golden_key(name)] = render_reference(name, overrides, res)
        print(f"golden {name:40s} {time.perf_counter() - t0:7.1f}s",
              flush=True)
    path = os.path.join("tools", "goldens", f"smoke_{res}.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
