"""Sweep SORT_EXPAND (E) x MESH_SUPER for the sorted big-mesh path.

Usage: python tools/sweep_bigmesh.py [scene.txt] [E:S ...]

Each config runs in a SUBPROCESS (MESH_SUPER is read at import time by
ops/megakernel and shapes the packed tables) with PT_TPU_SORT_EXPAND /
PT_TPU_MESH_SUPER set, timing N warm frames at the scene's native
resolution. Rationale for re-sweeping E in round 4: the prefix-window
tail made overflow lanes cheap (one block-rounding per super instead
of one per (start key, super)), so the E=6 knee measured in round 3b —
where overflow paid whole-mesh sweeps — may have moved down; smaller E
shrinks BOTH sorts linearly (dead-sentinel slots are most of the
expanded stream at E=6, per-lane entered mean 2.5).
ONE TPU process at a time (CLAUDE.md).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = r"""
import sys, time
sys.path.insert(0, %(repo)r)
import jax.numpy as jnp
from project3_cuda_path_tracer_tpu.models.scene import load_scene
from project3_cuda_path_tracer_tpu.render import Renderer, RenderSettings
N = 10
scene = load_scene(%(scene)r)
depth = scene.state.trace_depth or 8
r = Renderer(scene, RenderSettings(trace_depth=depth, use_pallas=True,
                                   use_bvh=False))
r.step_batch(N); float(jnp.sum(r.accum.x))
t0 = time.perf_counter(); r.step_batch(N); float(jnp.sum(r.accum.x))
dt = (time.perf_counter() - t0) / N
cam = scene.state.camera
px = int(cam.resolution[0]) * int(cam.resolution[1])
print(f"RESULT {dt*1e3:.1f} ms/frame {px*depth/dt/1e6:.1f} Mrays/s",
      flush=True)
"""


def main():
    args = [a for a in sys.argv[1:]]
    scene = next((a for a in args if a.endswith(".txt")), "mesh_big.txt")
    combos = [a for a in args if ":" in a] or [
        "2:32", "3:32", "4:32", "6:32", "4:16", "6:16", "8:16",
    ]
    scene_path = os.path.join(REPO, "scenes", scene)
    for combo in combos:
        e, sup = combo.split(":")
        env = dict(os.environ, PT_TPU_SORT_EXPAND=e,
                   PT_TPU_MESH_SUPER=sup)
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 PROBE % {"repo": REPO, "scene": scene_path}],
                env=env, capture_output=True, text=True, timeout=2400,
            )
            line = next(
                (ln for ln in r.stdout.splitlines()
                 if ln.startswith("RESULT")),
                f"FAILED rc={r.returncode}: "
                + (r.stderr.strip().splitlines() or ["?"])[-1][:200],
            )
        except subprocess.TimeoutExpired:
            line = "TIMEOUT"
        print(f"[{scene}] E={e} SUPER={sup}: {line}", flush=True)


if __name__ == "__main__":
    main()
