"""Command-line driver: the main()/runCuda() equivalent.

Same contract as the reference entry point (one scene-file argument,
/root/reference/src/main.cpp:33-41) plus runtime flags replacing the
reference's rebuild-to-toggle macros. Headless by default (renders to
completion and saves, like the reference's end-of-iterations path at
src/main.cpp:142-145); --preview opens an interactive viewer.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

from .models.scene import load_scene, scene_summary
from .render import Renderer, RenderSettings

log = logging.getLogger("pathtracer")


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="project3_cuda_path_tracer_tpu",
        description="TPU-native progressive path tracer",
    )
    p.add_argument("scene", help="scene file (reference text format)")
    p.add_argument("--iterations", type=int, default=None, help="override spp")
    p.add_argument("--depth", type=int, default=None, help="override trace depth")
    p.add_argument("--sort-materials", action="store_true")
    p.add_argument("--compact", action="store_true")
    p.add_argument("--cache-first-bounce", action="store_true")
    p.add_argument("--antialias", action="store_true")
    p.add_argument("--dof", action="store_true")
    p.add_argument("--russian-roulette", action="store_true")
    p.add_argument(
        "--direct-lighting",
        action="store_true",
        help="explicit light sampling (NEE) at the final bounce",
    )
    p.add_argument(
        "--nee",
        action="store_true",
        help="next-event estimation at EVERY diffuse bounce with MIS "
        "(power heuristic); superset of --direct-lighting",
    )
    p.add_argument(
        "--stratified",
        action="store_true",
        help="low-discrepancy (R2) hemisphere sampling per bounce "
        "(INSTRUCTION.md:122 'better hemisphere sampling')",
    )
    p.add_argument(
        "--sobol",
        action="store_true",
        help="Owen-scrambled Sobol hemisphere sampling (the "
        "(0,2)-sequence alternative to --stratified's R2 lattice)",
    )
    p.add_argument(
        "--motion-blur",
        action="store_true",
        help="jitter shutter time per iteration (geoms with VELOCITY move)",
    )
    p.add_argument(
        "--rr-start-depth",
        type=int,
        default=3,
        help="first bounce at which Russian roulette may kill paths",
    )
    p.add_argument(
        "--shard",
        default=None,
        metavar="SPEC",
        help="multi-chip rendering over a device mesh: 'spp=S' shards "
        "sample batches (S iterations per dispatch, psum over ICI), "
        "'px=N' shards pixel tiles, 'spp=S,px=N' composes both "
        "(needs S*N devices)",
    )
    p.add_argument("--no-bvh", action="store_true")
    p.add_argument(
        "--pallas",
        action="store_true",
        help="force the Pallas kernels (default on TPU backends; "
        "ineligible scenes/settings fall back to XLA automatically)",
    )
    p.add_argument(
        "--no-pallas",
        action="store_true",
        help="force the pure-XLA pipeline even on TPU",
    )
    p.add_argument("--hdr", action="store_true", help="also save Radiance HDR")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--checkpoint", default=None, help="resume from / save to .npz")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--preview", action="store_true", help="interactive viewer")
    p.add_argument("--profile", default=None, help="emit a jax.profiler trace dir")
    p.add_argument(
        "--debug",
        action="store_true",
        help="numeric net: checkify bounds sweep at startup + per-chunk "
        "finite-accumulator assertions (see utils/debug.py)",
    )
    p.add_argument(
        "--debug-nans",
        action="store_true",
        help="aggressive per-op NaN trapping (jax_debug_nans); may "
        "false-positive on intentionally masked lanes",
    )
    p.add_argument(
        "--stats",
        action="store_true",
        help="log per-bounce alive-ray counts and a per-stage time breakdown",
    )
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def _default_pallas(args) -> bool:
    """Pallas kernels by default on accelerator backends: ineligible
    scene/setting combinations fall back to XLA inside trace_paths, so
    opting in is always safe and 3-4x faster where it applies."""
    if args.no_pallas:
        return False
    if args.pallas:
        return True
    try:
        import jax

        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def settings_from_args(args, scene) -> RenderSettings:
    return RenderSettings(
        trace_depth=args.depth or scene.state.trace_depth or 8,
        sort_by_material=args.sort_materials,
        compact=args.compact,
        cache_first_bounce=args.cache_first_bounce,
        antialias=args.antialias,
        depth_of_field=args.dof,
        russian_roulette=args.russian_roulette,
        rr_start_depth=args.rr_start_depth,
        direct_lighting=args.direct_lighting,
        nee_mis=args.nee,
        stratified=args.stratified,
        sobol=args.sobol,
        motion_blur=args.motion_blur,
        use_bvh=not args.no_bvh,
        use_pallas=_default_pallas(args),
    )


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    try:
        return _run(args)
    except FileNotFoundError as e:
        log.error("file not found: %s", e.filename or e)
        return 1
    except Exception as e:  # clean CLI errors; -v for the traceback
        from .models.scene import SceneParseError

        if isinstance(e, SceneParseError):
            log.error("scene parse error: %s", e)
            return 1
        if args.verbose:
            raise
        log.error("%s: %s (re-run with -v for the traceback)", type(e).__name__, e)
        return 1


def _run(args) -> int:
    # Persistent XLA compilation cache: the Mosaic megakernels cost
    # 40-200 s to compile depending on scene size; cache them across
    # runs (keyed by program, so scene-shape/settings changes recompile).
    import os

    import jax

    cache_dir = os.environ.get(
        "PT_TPU_COMPILE_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "pt_tpu_jax",
        ),
    )
    if cache_dir != "0":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.debug_nans:
        from .utils.debug import enable_nan_debugging

        enable_nan_debugging()
        log.info("debug: jax_debug_nans enabled")

    scene = load_scene(args.scene)
    log.info(scene_summary(scene))
    settings = settings_from_args(args, scene)
    if (settings.sort_by_material or settings.compact) and settings.use_pallas:
        log.warning(
            "--sort-materials/--compact disable the fused whole-iteration "
            "Pallas kernel (they need per-bounce pool boundaries); expect "
            "a large slowdown vs plain --pallas — see docs/ANALYSIS.md"
        )
    if args.shard:
        from .parallel.shard import ShardedRenderer, parse_shard_spec

        spp, px, tri = parse_shard_spec(args.shard)
        if args.preview or args.stats:
            log.warning(
                "--shard does not support --preview/--stats; "
                "ignoring them"
            )
            args.preview = False
            args.stats = False
        renderer = ShardedRenderer(scene, settings, spp=spp, px=px, tri=tri)
        log.info(
            "sharded rendering: mesh %s (%d device(s), %s)",
            dict(renderer.mesh.shape), spp * px * tri,
            renderer.mesh.devices.flat[0].platform,
        )
    else:
        renderer = Renderer(scene, settings)

    if args.debug:
        from .utils.debug import checkify_sweep

        log.info("debug: running checkify bounds sweep (one iteration)...")
        checkify_sweep(renderer)
        log.info("debug: bounds sweep clean")

    if args.checkpoint:
        import os

        # np.savez_compressed appends .npz; normalize once so the resume
        # existence check and the save target agree on the filename.
        if not args.checkpoint.endswith(".npz"):
            args.checkpoint += ".npz"
        if os.path.exists(args.checkpoint):
            renderer.load_checkpoint(args.checkpoint)
            log.info("resumed from %s at iteration %d", args.checkpoint, renderer.iteration)

    target = args.iterations if args.iterations is not None else scene.state.iterations

    if args.preview:
        from .viewer import run_viewer

        run_viewer(renderer, target)
        return 0

    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)

    from .utils.profiling import sync_value

    if args.stats:
        renderer.step()
        import numpy as np

        log.info(
            "alive rays per bounce (iter 1): %s",
            np.asarray(renderer.last_alive_counts).tolist(),
        )
        from .utils.profiling import stage_breakdown

        for stage, secs in stage_breakdown(renderer, reps=3).items():
            log.info("stage %-16s %8.2f ms", stage, 1e3 * secs)

    t0 = time.perf_counter()
    last_t, last_iter = t0, renderer.iteration
    last_ckpt_iter = renderer.iteration
    rays_per_iter = renderer.camera.pixel_count * settings.trace_depth

    # Batched stepping: one compiled dispatch per chunk (the reference
    # pays a launch + D2H copy per iteration; we do neither).
    chunk = max(1, min(args.log_every or 50, 50))
    while renderer.iteration < target:
        n = min(chunk, target - renderer.iteration)
        renderer.step_batch(n)
        it = renderer.iteration
        if args.debug:
            from .utils.debug import assert_finite

            assert_finite(renderer.accum, it)
        if args.log_every and (it % args.log_every == 0 or it >= target):
            sync_value(renderer.accum.x)
            now = time.perf_counter()
            dt = now - last_t
            n_done = it - last_iter
            mrays = rays_per_iter * n_done / dt / 1e6 if dt > 0 else 0.0
            log.info(
                "iter %d/%d  %.1f ms/iter  %.1f Mrays/s",
                it, target, 1e3 * dt / max(n_done, 1), mrays,
            )
            last_t, last_iter = now, it
        # Iterations advance in chunks, so `it` may never be an exact
        # multiple of checkpoint_every; checkpoint whenever a boundary
        # was crossed since the last checkpoint.
        if (
            args.checkpoint
            and args.checkpoint_every
            and it // args.checkpoint_every > last_ckpt_iter // args.checkpoint_every
        ):
            renderer.save_checkpoint(args.checkpoint)
            last_ckpt_iter = it

    sync_value(renderer.accum.x)
    if args.profile:
        jax.profiler.stop_trace()

    total = time.perf_counter() - t0
    log.info("rendered %d spp in %.2fs", renderer.iteration, total)

    path = renderer.save(out_dir=args.out_dir)
    log.info("saved %s", path)
    if args.hdr:
        log.info("saved %s", renderer.save(out_dir=args.out_dir, hdr=True))
    if args.checkpoint:
        renderer.save_checkpoint(args.checkpoint)
    return 0


if __name__ == "__main__":
    sys.exit(main())
