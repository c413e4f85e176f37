"""Canonical benchmark: Cornell 800x800 depth-8 throughput on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: BASELINE.json north-star of 100 Mrays/sec sustained on one
TPU v5e chip (Mrays counted as pixels x trace_depth per iteration, the
upper-bound convention of BASELINE.md "ray segments per iteration").
"""

import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_MRAYS = 100.0

# Watchdog: a dead TPU tunnel hangs at backend init (register() is
# fine; the first device use never returns — the round-3b outage).
# Fail with a diagnostic JSON line instead of hanging the driver.
WATCHDOG_S = int(os.environ.get("PT_TPU_BENCH_WATCHDOG", "1200"))


def _watchdog(signum, frame):
    print(json.dumps({
        "metric": "Mrays/sec (Cornell 800x800 depth-8, one TPU chip)",
        "value": 0.0,
        "unit": "Mrays/s",
        "vs_baseline": 0.0,
        "error": f"TPU unreachable: no device response within "
                 f"{WATCHDOG_S}s (tunnel down?)",
    }), flush=True)
    os._exit(2)


def main():
    if hasattr(signal, "SIGALRM") and WATCHDOG_S > 0:
        signal.signal(signal.SIGALRM, _watchdog)
        signal.alarm(WATCHDOG_S)
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)

    from project3_cuda_path_tracer_tpu.models.scene import load_scene
    from project3_cuda_path_tracer_tpu.render import Renderer, RenderSettings

    scene = load_scene(os.path.join(here, "scenes", "cornell.txt"))
    settings = RenderSettings(trace_depth=8, use_bvh=False, antialias=True, use_pallas=True)
    r = Renderer(scene, settings)

    def sync():
        # Force completion with a value fetch: through the axon tunnel,
        # block_until_ready alone does not flush the execution queue.
        out = float(jnp.sum(r.accum.x))
        if hasattr(signal, "SIGALRM"):
            signal.alarm(WATCHDOG_S)  # re-arm: progress happened
        return out

    # One fixed batch size -> one compile, reused for warmup and timing.
    BATCH = 25
    r.step_batch(BATCH)
    sync()

    # Timed steady-state window.
    n_timed = 8 * BATCH
    t0 = time.perf_counter()
    for _ in range(8):
        r.step_batch(BATCH)
    sync()
    dt = time.perf_counter() - t0

    pixels = scene.state.camera.pixel_count
    rays_per_iter = pixels * settings.trace_depth
    ms_per_frame = 1e3 * dt / n_timed
    mrays = rays_per_iter * n_timed / dt / 1e6
    time_to_5000 = ms_per_frame * 5000 / 1e3

    result = {
        "metric": "Mrays/sec (Cornell 800x800 depth-8, one TPU chip)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "ms_per_frame": round(ms_per_frame, 3),
        "time_to_5000spp_s": round(time_to_5000, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
