"""Compile-smoke every bundled scene through the Pallas path on the
attached device (Mosaic bugs don't reproduce in interpret mode — see
the round-1 bool-select incident). Small resolution, two iterations:

    python tools/smoke_pallas.py [res]

Prints one line per scene; exits non-zero if any scene fails.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, ".")

import numpy as np

SCENES = [
    ("cornell.txt", {}),
    ("sphere.txt", {}),
    ("cornell_glass.txt", {"russian_roulette": True}),
    ("cornell_dof.txt", {"antialias": True, "depth_of_field": True}),
    ("cornell_sss.txt", {}),
    ("textured.txt", {}),  # in-kernel one-hot file-texture + bump fetch
    ("checker.txt", {}),  # checker-only: rides the megakernel
    ("env.txt", {}),  # constant ENVLIGHT: fused in-kernel
    ("envmap.txt", {}),  # lat-long ENVMAP: in-kernel one-hot fetch
    # file textures under the fused NEE estimator
    ("textured.txt --nee", {"nee_mis": True}),
    ("mesh.txt", {}),  # per-bounce global-compaction pipeline
    ("mesh_big.txt", {}),
    ("bunny.txt", {}),  # BASELINE config 4 (69k-tri bunny-class mesh)
    ("mesh_stream.txt", {}),  # 82k tris: HBM-streamed triangle table
    ("mesh_textured.txt", {}),  # Pallas intersect + XLA texture shading
    ("many_materials.txt", {"russian_roulette": True}),
    ("cornell.txt --stratified", {"stratified": True}),
    ("cornell.txt --sobol", {"sobol": True}),
    ("cornell.txt --nee", {"nee_mis": True}),
    # big-body fallback: per-bounce fused NEE kernel (38x32 body)
    ("many_materials.txt --nee", {"nee_mis": True, "russian_roulette": True}),
]


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from project3_cuda_path_tracer_tpu.models.device import scene_to_device
    from project3_cuda_path_tracer_tpu.models.scene import (
        derive_camera,
        load_scene,
    )
    from project3_cuda_path_tracer_tpu.render import (
        Renderer,
        RenderSettings,
        guard_tpu_mesh_path,
    )

    failures = []
    # Native-resolution eligibility sweep FIRST (cheap, no compiles):
    # every bundled scene must pass the TPU mesh guard AT ITS OWN
    # declared resolution — round 2 shipped mesh_textured.txt (800x800)
    # in a state the guard refused and nothing in CI noticed (the smoke
    # ran 128x128 only).
    for name, overrides in SCENES:
        fname = name.split()[0]
        scene = load_scene(os.path.join("scenes", fname))
        settings = RenderSettings(
            trace_depth=min(scene.state.trace_depth or 8, 8),
            use_pallas=True,
            **overrides,
        )
        try:
            guard_tpu_mesh_path(
                scene_to_device(scene, use_bvh=False), settings,
                scene.state.camera.pixel_count,
            )
        except RuntimeError as e:
            print(f"GUARD {name}: {e}", flush=True)
            failures.append(f"guard:{name}")
    if failures:
        print("FAILED:", failures)
        return 1
    print("native-resolution guard eligibility: all scenes pass", flush=True)
    for name, overrides in SCENES:
        fname = name.split()[0]
        try:
            scene = load_scene(os.path.join("scenes", fname))
            cam = scene.state.camera
            scene.state.camera = derive_camera(
                (res, res), cam.position, cam.look_at,
                np.array([0, 1, 0], np.float32), float(cam.fov[1]),
                cam.aperture, cam.focal_distance,
            )
            settings = RenderSettings(
                trace_depth=min(scene.state.trace_depth or 8, 8),
                use_pallas=True,
                **overrides,
            )
            r = Renderer(scene, settings)
            t0 = time.perf_counter()
            r.step_batch(2)
            img = r.image()
            dt = time.perf_counter() - t0
            ok = bool(np.isfinite(img).all()) and float(img.max()) > 0
            status = "OK " if ok else "BAD"
            print(f"{status} {name:34s} {dt:7.1f}s  max={img.max():.2f}",
                  flush=True)
            if not ok:
                failures.append(name)
        except Exception as e:
            print(f"FAIL {name:34s} {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
            failures.append(name)
    if failures:
        print("FAILED:", failures)
        return 1
    print("all scenes smoke-compiled clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
