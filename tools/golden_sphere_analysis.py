"""Golden mirror-sphere discrepancy analysis (VERDICT r1 weak #3).

The reference golden (img/REFERENCE_cornell.5000samp.png) shows the
cornell sphere as a matte ball although scenes/cornell.txt gives it
REFL=1 (perfect mirror). This script renders BOTH interpretations at
5000 spp on the attached device and measures each against the golden,
inside and outside the analytically-projected sphere silhouette:

    python tools/golden_sphere_analysis.py [spp]

Writes /tmp/golden_sphere_report.txt + the two renders. The numbers are
recorded in docs/ANALYSIS.md; tests/test_render.py's sphere mask cites
them.
"""

import copy
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from project3_cuda_path_tracer_tpu.models.scene import load_scene
from project3_cuda_path_tracer_tpu.render import Renderer, RenderSettings


def sphere_mask_png(scene, dilate: int = 2) -> np.ndarray:
    """Analytic sphere silhouette in saved-PNG pixel space."""
    cam = scene.state.camera
    resx, resy = cam.resolution
    xs = np.arange(resx, dtype=np.float32)
    ys = np.arange(resy, dtype=np.float32)
    X, Y = np.meshgrid(xs, ys)
    sx = cam.pixel_length[0] * (X - resx * 0.5)
    sy = cam.pixel_length[1] * (Y - resy * 0.5)
    d = (
        cam.view[None, None, :]
        - cam.right[None, None, :] * sx[..., None]
        - cam.up[None, None, :] * sy[..., None]
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    C = np.array([-1.0, 4.0, -1.0], np.float32) - cam.position
    r = 1.5
    b = (d * C).sum(-1)
    disc = b * b - ((C * C).sum() - r * r)
    mask = (disc >= 0) & (b > 0)
    if dilate:
        from scipy.ndimage import binary_dilation

        mask = binary_dilation(mask, iterations=dilate)
    return mask[:, ::-1]  # accumulator -> saved-PNG x flip


def render_png_space(scene, spp: int, chunk: int = 250) -> np.ndarray:
    r = Renderer(scene, RenderSettings(trace_depth=8, use_pallas=True))
    done = 0
    t0 = time.perf_counter()
    while done < spp:
        n = min(chunk, spp - done)
        r.step_batch(n)
        done += n
        # sync through a reduction (see CLAUDE.md TPU-tunnel notes)
        import jax.numpy as jnp

        float(jnp.sum(r.accum.x))
        print(f"  {done}/{spp} spp  ({time.perf_counter()-t0:.1f}s)", flush=True)
    return np.clip(r.image()[:, ::-1, :] / spp, 0.0, 1.0)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    from PIL import Image

    gold = (
        np.asarray(
            Image.open(
                "/root/reference/img/REFERENCE_cornell.5000samp.png"
            ).convert("RGB"),
            np.float32,
        )
        / 255.0
    )

    scene = load_scene("scenes/cornell.txt")
    mask = sphere_mask_png(scene)

    print("rendering mirror variant (scene as written, REFL=1)...")
    mirror = render_png_space(scene, spp)

    print("rendering diffuse-sphere variant (REFL forced 0)...")
    diff_scene = copy.copy(scene)
    diff_scene.materials = copy.deepcopy(scene.materials)
    diff_scene.materials.has_reflective[4] = 0.0
    diffuse = render_png_space(diff_scene, spp)

    Image.fromarray((mirror * 255).astype(np.uint8)).save(
        "/tmp/cornell_mirror.png"
    )
    Image.fromarray((diffuse * 255).astype(np.uint8)).save(
        "/tmp/cornell_diffuse_sphere.png"
    )

    def mad(a, b, m):
        return float(np.abs(a - b)[m].mean())

    lines = [
        f"spp={spp}  sphere px={int(mask.sum())}",
        f"MIRROR : full {np.abs(mirror-gold).mean():.4f}  "
        f"sphere {mad(mirror, gold, mask):.4f}  "
        f"background {mad(mirror, gold, ~mask):.4f}",
        f"DIFFUSE: full {np.abs(diffuse-gold).mean():.4f}  "
        f"sphere {mad(diffuse, gold, mask):.4f}  "
        f"background {mad(diffuse, gold, ~mask):.4f}",
    ]
    report = "\n".join(lines)
    print(report)
    with open("/tmp/golden_sphere_report.txt", "w") as f:
        f.write(report + "\n")


if __name__ == "__main__":
    main()
