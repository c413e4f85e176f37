"""A/B the in-kernel file-texture path on textured scenes (TPU).

Correctness: 128x128 4spp kernel-vs-XLA image diff (bit-near-exact
expected). Perf: timed 800x800 batches with the kernel path vs the
XLA shading path (PT_TPU_FORCE_XLA_TEX=1 unsupported — use
use_pallas=False for the B side at small res only; the XLA number at
800x800 is the recorded round-3 baseline 8.0 Mrays/s).
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

SCENE = sys.argv[1] if len(sys.argv) > 1 else "textured.txt"


def make_renderer(res, use_pallas):
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
        RenderSettings(trace_depth=depth, use_pallas=use_pallas,
                       use_bvh=False),
    )
    return r, depth


def image(r):
    acc = r.accum
    out = np.stack(
        [np.asarray(acc.x), np.asarray(acc.y), np.asarray(acc.z)], -1
    )
    return out / max(r.iteration, 1)


# correctness at 128x128
if "--no-check" not in sys.argv:
    imgs = {}
    for up in (True, False):
        r, _ = make_renderer(128, up)
        r.step_batch(4)
        float(jnp.sum(r.accum.x))
        imgs[up] = image(r)
    d = np.abs(imgs[True] - imgs[False])
    print(f"[{SCENE}] correctness 128x128 4spp: max|d|={d.max():.3e} "
          f"mean|d|={d.mean():.3e} frac>1e-3={(d > 1e-3).mean():.5f}",
          flush=True)

# perf at 800x800, kernel path
r, depth = make_renderer(800, True)
r.step_batch(2)  # warm exact batch size
float(jnp.sum(r.accum.x))
t0 = time.perf_counter()
r.step_batch(2)
float(jnp.sum(r.accum.x))
dt = (time.perf_counter() - t0) / 2
mrays = 800 * 800 * depth / dt / 1e6
print(f"[{SCENE}] kernel path: {dt*1e3:.1f} ms/frame  "
      f"{mrays:.1f} Mrays/s  (XLA round-3 baseline: 8.0)", flush=True)
