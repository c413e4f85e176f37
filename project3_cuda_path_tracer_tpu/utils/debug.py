"""Debug-mode numeric net (SURVEY.md §5 race-detection/sanitizer row).

The reference's always-on sanitizer is checkCUDAError: a
cudaDeviceSynchronize + cudaGetLastError after every kernel launch
(/root/reference/src/pathtrace.cu:17-39). XLA raises on real device
faults by itself; what a renderer actually needs caught is the silent
failure mode — the image quietly going NaN/Inf/black — plus
out-of-bounds gathers/scatters, which XLA *clamps* instead of trapping.

Three nets, composable, all behind flags (zero cost when off):

1. `checkify_sweep(renderer)` — one render iteration traced under
   jax.experimental.checkify with index_checks: every jnp.take /
   scatter-add in the pipeline (material gather, texture atlas fetch,
   finalGather, compaction permutation) gets a real bounds check
   instead of XLA's silent clamp. Run once at startup under --debug.
2. `assert_finite(accum, iteration)` — host-side finite check of the
   accumulator, run per logging chunk under --debug. No false
   positives: masked intermediate infs (slab divisions etc.) are fine,
   a non-finite *image* never is.
3. `enable_nan_debugging()` — jax_debug_nans for the aggressive per-op
   mode (--debug-nans). May false-positive on intentionally masked
   NaN-producing lanes; documented as the heavy hammer.
"""

from __future__ import annotations

import numpy as np


def enable_nan_debugging() -> None:
    """Turn on jax_debug_nans: re-runs any op producing NaN un-jitted
    and raises with the offending primitive. Aggressive — lanes whose
    NaNs are intentionally masked out later will also trip it."""
    import jax

    jax.config.update("jax_debug_nans", True)


def assert_finite(accum, iteration: int) -> None:
    """Raise if the radiance accumulator contains NaN/Inf (forces a
    device sync; debug mode only)."""
    for name, lane in (("R", accum.x), ("G", accum.y), ("B", accum.z)):
        arr = np.asarray(lane)
        if not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"accumulator channel {name} has {bad} non-finite values "
                f"at iteration {iteration} (enable --debug-nans to locate "
                f"the producing op)"
            )


def checkify_sweep(renderer) -> None:
    """Trace + run ONE iteration under checkify index/user checks.

    Catches out-of-bounds indexing that XLA would silently clamp
    (material ids, texture atlas fetches, compaction permutations,
    finalGather pixel ids). Raises checkify's error with a location on
    failure; silent on success. Compiles a separate program — debug
    mode only.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import checkify

    from ..render import _empty_cache, trace_paths

    scene, cam, settings = (
        renderer.dev_scene,
        renderer.dev_camera,
        renderer.settings,
    )
    P = renderer.camera.pixel_count

    def one_iter(scene, cam):
        return trace_paths(
            scene, cam, jnp.int32(1), _empty_cache(P), settings, False
        )

    checked = jax.jit(
        checkify.checkify(
            one_iter, errors=checkify.index_checks | checkify.user_checks
        )
    )
    err, _ = checked(scene, cam)
    checkify.check_error(err)
