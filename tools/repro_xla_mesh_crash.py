"""Minimal repro harness for the legacy XLA-mesh TPU worker crash.

The guarded failure (render.guard_tpu_mesh_path): `--no-pallas` mesh
renders — the full-pool XLA intersect_scene with per-lane mesh
gathers — wedge the TPU worker at large pool sizes (round 2: ~6 min
compile then a worker fault with an hour-scale recovery at 800x800;
128x128 survives). This tool finds the smallest crashing pool size so
the guard's 200k-pixel threshold is evidence, not folklore
(VERDICT round 2, "Next" #8; docs/ROADMAP.md).

Each probe runs in a SUBPROCESS with PT_TPU_ALLOW_XLA_MESH=1 and a
hard timeout: a clean exit means the size is safe, a timeout or
nonzero exit means the compile hung or the worker faulted. After any
failure the tool waits for the tunnel to answer a trivial program
before probing further (worker recovery is minutes-scale), and it
probes ASCENDING so the first failure ends the run with the boundary
bracketed.

Usage: python tools/repro_xla_mesh_crash.py [--scene mesh.txt]
       [--sizes 128,256,384,512,640,800] [--timeout 600]

ONE TPU process at a time (CLAUDE.md); this tool owns the TPU while
it runs.
"""
import argparse
import subprocess
import sys
import time

PROBE = r"""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
from project3_cuda_path_tracer_tpu.models.scene import (
    derive_camera, load_scene,
)
from project3_cuda_path_tracer_tpu.render import Renderer, RenderSettings

res = int(sys.argv[1])
scene = load_scene(f"/root/repo/scenes/{sys.argv[2]}")
c0 = scene.state.camera
scene.state.camera = derive_camera(
    (res, res), c0.position, c0.look_at,
    np.array([0, 1, 0], np.float32), float(c0.fov[1]),
)
r = Renderer(scene, RenderSettings(trace_depth=8, use_pallas=False,
                                   use_bvh=False))
r.step_batch(4)
import jax.numpy as jnp
print("ok", float(jnp.sum(r.accum.x)), flush=True)
"""

HEALTH = (
    "import jax, jax.numpy as jnp; "
    "print(float(jnp.sum(jnp.ones(5))))"
)


def tunnel_alive(timeout=120):
    try:
        r = subprocess.run(
            [sys.executable, "-c", HEALTH],
            capture_output=True, timeout=timeout, text=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="mesh.txt")
    ap.add_argument("--sizes", default="128,256,384,512,640,800")
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("--recovery-wait", type=int, default=1800,
                    help="max seconds to wait for worker recovery")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    results = []
    for res in sizes:
        print(f"[probe] {res}x{res} ({res * res} px) "
              f"--no-pallas {args.scene} ...", flush=True)
        t0 = time.time()
        env = dict(__import__("os").environ,
                   PT_TPU_ALLOW_XLA_MESH="1")
        try:
            r = subprocess.run(
                [sys.executable, "-c", PROBE, str(res), args.scene],
                env=env, capture_output=True, text=True,
                timeout=args.timeout,
            )
            ok = r.returncode == 0 and "ok" in r.stdout
            dt = time.time() - t0
            tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
            print(f"[probe] {res}: {'SURVIVED' if ok else 'FAILED'} "
                  f"in {dt:.0f}s  {' | '.join(tail)}", flush=True)
        except subprocess.TimeoutExpired:
            ok = False
            print(f"[probe] {res}: TIMEOUT after {args.timeout}s "
                  f"(hung compile or worker fault)", flush=True)
        results.append((res, ok))
        if not ok:
            print(f"[probe] boundary: "
                  f"{results[-2][0] if len(results) > 1 else '<min'}"
                  f" survives, {res} fails", flush=True)
            print("[probe] waiting for worker recovery ...",
                  flush=True)
            t0 = time.time()
            while time.time() - t0 < args.recovery_wait:
                if tunnel_alive():
                    print(f"[probe] tunnel recovered after "
                          f"{time.time() - t0:.0f}s", flush=True)
                    break
                time.sleep(60)
            else:
                print("[probe] tunnel did NOT recover in time",
                      flush=True)
            break
    print("RESULTS:", results, flush=True)


if __name__ == "__main__":
    main()
