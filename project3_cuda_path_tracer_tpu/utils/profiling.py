"""Tracing / profiling utilities (SURVEY.md §5).

The reference's sanctioned workflow is external NSight timing of each
kernel (INSTRUCTION.md:349-355); here the equivalents are:
- `jax.profiler` TensorBoard traces via the CLI --profile flag,
- `stage_breakdown()`: wall-time of each pipeline stage compiled and
  timed in isolation (raygen / intersect sweep / shade / full bounce /
  full iteration) — the per-kernel stacked-bar-chart data,
- `alive_curve()`: unterminated rays per bounce (the INSTRUCTION.md:
  340-348 compaction analysis, automated),
- value-fetch `sync()` helpers that actually flush the axon tunnel
  (block_until_ready alone does not).
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def sync_value(x) -> float:
    """Force completion + fetch through the TPU tunnel."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf))


def _time_fn(fn, *args, reps: int = 5) -> float:
    out = fn(*args)
    sync_value(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync_value(out)
        best = min(best, time.perf_counter() - t0)
    return best


def stage_breakdown(renderer, reps: int = 5) -> Dict[str, float]:
    """Per-stage wall times (seconds, best of reps) for one iteration at
    the renderer's resolution/settings. Stages are compiled standalone,
    so the sum exceeds the fused full-iteration time — the deltas are
    the point (which stage dominates), like the reference's per-kernel
    NSight bars."""
    from ..ops.camera import generate_rays
    from ..ops.sweep import intersect_scene
    from ..render import _empty_cache, _shade_step, trace_paths

    scene = renderer.dev_scene
    cam = renderer.dev_camera
    settings = renderer.settings
    it = jnp.int32(max(renderer.iteration, 1))

    raygen = jax.jit(
        lambda it: generate_rays(
            cam, it, settings.antialias, settings.depth_of_field
        )
    )
    origins, dirs, pix = raygen(it)

    intersect = jax.jit(
        lambda o, d: intersect_scene(o, d, scene, use_bvh=settings.use_bvh)
    )
    isect = intersect(origins, dirs)

    from ..ops.vec import Vec3

    P = pix.shape[0]
    state = (
        origins,
        dirs,
        Vec3.ones((P,)),
        Vec3.zeros((P,)),
        jnp.ones((P,), bool),
        pix,
    )
    shade = jax.jit(
        lambda st, isect, it: _shade_step(st, isect, scene, it, 0, settings)
    )
    _ = shade(state, isect, it)

    full = jax.jit(
        lambda it: trace_paths(
            scene, cam, it, _empty_cache(P), settings, False
        )[0]
    )

    out = {
        "raygen": _time_fn(raygen, it, reps=reps),
        "intersect_sweep": _time_fn(intersect, origins, dirs, reps=reps),
        "shade": _time_fn(shade, state, isect, it, reps=reps),
        "full_iteration": _time_fn(full, it, reps=reps),
    }
    if settings.use_pallas:
        from ..ops.megakernel import bounce_step_pallas

        bounce = jax.jit(
            lambda st, it: bounce_step_pallas(
                st, scene, it, jnp.int32(1), settings
            )
        )
        if P % 1024 == 0:
            _ = bounce(state, it)
            out["pallas_bounce"] = _time_fn(bounce, state, it, reps=reps)
    return out


def alive_curve(renderer) -> np.ndarray:
    """Unterminated rays per bounce for the next iteration."""
    renderer.step()
    return np.asarray(renderer.last_alive_counts)


def mrays_per_sec(renderer, iters: int = 50) -> float:
    """Sustained throughput (upper-bound ray count convention of
    BASELINE.md: pixels x depth per iteration)."""
    renderer.step_batch(5)
    sync_value(renderer.accum.x)
    t0 = time.perf_counter()
    renderer.step_batch(iters)
    sync_value(renderer.accum.x)
    dt = time.perf_counter() - t0
    rays = renderer.camera.pixel_count * renderer.settings.trace_depth * iters
    return rays / dt / 1e6
