"""Root-cause scaling probe for the legacy XLA-mesh worker wedge.

The guarded failure (render.guard_tpu_mesh_path): `--no-pallas` mesh
renders wedge the TPU worker at large pools (round 2: ~6 min compile
then an hour-scale outage at 800x800; 128x128 survives). The crash
harness (tools/repro_xla_mesh_crash.py) brackets the boundary by
CRASHING the worker — expensive. This probe instead times the two
halves of `_mesh_intersect_naive` (ops/sweep.py) separately at
known-SAFE pool sizes (<= the guard's 200k-pixel threshold) and fits
their scaling, so the 800x800 behavior is explained without ever
wedging the worker:

  scan   — the (8,P)-broadcast Moller-Trumbore lax.scan over tri
           chunks (O(P*T) FLOPs, static shapes; expected linear in P
           and well-behaved),
  gather — the 12 winner-attribute `jnp.take`s (count,)-table x (P,)
           dynamic indices + the in-scan take_along_axis — the op
           class the TPU backend has no per-lane hardware for.

If `gather` scales superlinearly (or its absolute time at 200k px
already implies minutes-scale frames at 640k px x depth x batch),
the "crash" is a wedge: the worker executes a pathologically-lowered
gather program for so long the tunnel declares it dead — a latency
cliff, not a compiler fault. Evidence goes to docs/ANALYSIS.md; the
guard threshold stays, now with a measured mechanism behind it.

Usage: python tools/xla_mesh_scaling.py [--sizes 16384,65536,147456]
ONE TPU process at a time (CLAUDE.md).
"""
import argparse
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
from project3_cuda_path_tracer_tpu.models.device import (  # noqa: E402
    scene_to_device,
)
from project3_cuda_path_tracer_tpu.ops import sweep  # noqa: E402
from project3_cuda_path_tracer_tpu.ops.vec import Vec3  # noqa: E402


def sync(x):
    # block_until_ready does NOT flush the axon tunnel (CLAUDE.md)
    return float(jnp.sum(x))


def time_fn(fn, *args, n=5):
    out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="mesh.txt")
    ap.add_argument("--sizes", default="16384,65536,147456")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    scene = load_scene(os.path.join(REPO, "scenes", args.scene))
    # scene_to_device directly: the probe never builds a Renderer, so
    # guard_tpu_mesh_path (whose wedge this probe explains) stays out
    # of the way — every probe size here is BELOW its 200k threshold.
    ds = scene_to_device(scene, use_bvh=False)
    mi = next(
        i for i in range(len(ds.gtypes)) if ds.tri_ranges[i][1] > 0
    )
    start, count = ds.tri_ranges[mi]

    def gather_only(idx, bu, bv):
        take = lambda col: jnp.take(
            jax.lax.slice_in_dim(col, start, start + count), idx, axis=0
        )
        w = 1.0 - bu - bv
        acc = []
        for v3 in (ds.tri_n0, ds.tri_n1, ds.tri_n2):
            acc += [take(v3.x), take(v3.y), take(v3.z)]
        for col in (ds.tri_uv0u, ds.tri_uv0v, ds.tri_uv1u):
            acc.append(take(col))
        out = acc[0] * w
        for a in acc[1:]:
            out = out + a * bu
        return out

    def full_naive(o3, d3):
        return sweep._mesh_intersect_naive(ds, mi, o3, d3)

    print(f"[{args.scene}] tris={count} "
          f"(guard threshold 200k px; all probe sizes below it)",
          flush=True)
    rows = []
    for P in sizes:
        key = jax.random.PRNGKey(0)
        o = Vec3(
            jnp.zeros((P,), jnp.float32),
            jnp.full((P,), 5.0, jnp.float32),
            jnp.full((P,), 10.0, jnp.float32),
        )
        th = jnp.linspace(0.0, 1.0, P)
        d = Vec3(
            0.1 * th,
            -0.2 * jnp.ones((P,)),
            -jnp.ones((P,)),
        )
        dn = d.normalize()
        idx = jax.random.randint(key, (P,), 0, count)
        bu = jax.random.uniform(key, (P,), jnp.float32, 0.0, 0.5)
        bv = jax.random.uniform(key, (P,), jnp.float32, 0.0, 0.5)

        tg = time_fn(jax.jit(gather_only), idx, bu, bv)
        tf = time_fn(jax.jit(full_naive), o, dn)
        rows.append((P, tg, tf))
        print(f"  P={P:7d}: gather12={tg*1e3:8.2f} ms   "
              f"full_naive={tf*1e3:8.2f} ms", flush=True)

    if len(rows) >= 2:
        (p0, g0, f0), (p1, g1, f1) = rows[0], rows[-1]
        import math
        eg = math.log(g1 / g0) / math.log(p1 / p0)
        ef = math.log(f1 / f0) / math.log(p1 / p0)
        P800 = 800 * 800
        g800 = g1 * (P800 / p1) ** eg
        f800 = f1 * (P800 / p1) ** ef
        # step_batch(4) at depth 8 = 32 intersect calls
        print(f"scaling exponents: gather {eg:.2f}, full {ef:.2f}")
        print(f"extrapolated 800x800: gather12={g800*1e3:.1f} ms, "
              f"full_naive={f800*1e3:.1f} ms, "
              f"step_batch(4) d8 ~ {32*f800:.1f} s", flush=True)


if __name__ == "__main__":
    main()
