"""Test harness: CPU JAX with 8 virtual devices for sharding tests.

Must set env before jax initializes (SURVEY.md §4: CPU-vs-TPU
consistency via jit on CPU devices; interpreter-mode Pallas tests).
"""

import os
import sys

# XLA:CPU compiles on ~8 MB-stack pool threads that overflow on deep
# compiler recursion over programs embedding several in-tile routing
# networks (the in-tile radix sort / sorted-stream pipeline,
# ops/pipeline.py::_radix_sort_tile) — SIGSEGV with the
# fault address just below sp. Mosaic (real TPU) is unaffected; on CPU
# the one process-wide lever is interposing pthread_create with a
# big-stack shim (csrc/bigstack.cpp), which must be LD_PRELOADed before
# the process starts — so build it and re-exec pytest once.
#
# The MAIN thread can overflow the same way (shard_map'd pipeline
# programs compile on the caller's thread — the
# test_mesh_scene_pallas_under_shard_map segfault); its stack grows
# lazily up to RLIMIT_STACK at fault time, so raising the soft limit
# here (no re-exec needed) is sufficient.
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 1 << 30
    if _hard == resource.RLIM_INFINITY or _hard >= _want:
        if _soft != resource.RLIM_INFINITY and _soft < _want:
            resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
except Exception:
    pass
if (
    sys.platform == "linux"
    and "bigstack" not in os.environ.get("LD_PRELOAD", "")
    and os.environ.get("PT_TPU_BIGSTACK", "1") != "0"
):
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from project3_cuda_path_tracer_tpu.utils.native import (  # noqa: E402
        bigstack_preload_path,
    )

    _so = bigstack_preload_path()
    if _so:
        os.environ["LD_PRELOAD"] = (
            (os.environ.get("LD_PRELOAD", "") + " " + _so).strip()
        )
        os.environ["PT_TPU_BIGSTACK"] = "0"  # re-exec exactly once
        # pytest's fd-capture has already pointed fd 1/2 at a private
        # temp file by the time initial conftests load; an execve here
        # would silently send ALL of the re-exec'd run's output there.
        # Suspend global capture first so the child inherits the real
        # stdout/stderr.
        try:
            import gc

            from _pytest.capture import CaptureManager

            for _o in gc.get_objects():
                if isinstance(_o, CaptureManager):
                    _o.suspend_global_capture()
                    break
        except Exception:
            pass
        os.execve(
            sys.executable,
            [sys.executable, "-m", "pytest"] + sys.argv[1:],
            os.environ,
        )

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force the real CPU backend: the environment's sitecustomize registers
# the axon TPU plugin in a way that overrides the JAX_PLATFORMS env var,
# and unit tests must not depend on (or flake with) the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Single-core CI boxes pay ~seconds per XLA compile; cache across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENES = os.path.join(REPO_ROOT, "scenes")
GOLDEN = "/root/reference/img/REFERENCE_cornell.5000samp.png"

# Texture fixtures are deterministic generated files; self-provision if
# a fresh checkout is missing them (they are also committed).
_ASSETS = os.path.join(SCENES, "assets")
if not all(
    os.path.exists(os.path.join(_ASSETS, n))
    for n in ("stripes.png", "bubbles.png", "sky.png")
):
    import sys

    sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
    from gen_textures import write_assets  # noqa: E402

    write_assets(_ASSETS)
    sys.path.pop(0)


@pytest.fixture(scope="session")
def cornell_scene():
    from project3_cuda_path_tracer_tpu.models.scene import load_scene

    return load_scene(os.path.join(SCENES, "cornell.txt"))


@pytest.fixture(scope="session")
def sphere_scene():
    from project3_cuda_path_tracer_tpu.models.scene import load_scene

    return load_scene(os.path.join(SCENES, "sphere.txt"))


@pytest.fixture(scope="session")
def golden_image():
    """Reference 5000-spp Cornell render, float RGB in [0,1]."""
    from PIL import Image

    if not os.path.exists(GOLDEN):
        pytest.skip("reference golden image not available")
    return np.asarray(Image.open(GOLDEN).convert("RGB"), np.float32) / 255.0


def make_small_cornell(scene, res=(32, 32)):
    """Clone the cornell scene at a small resolution for fast tests."""
    import copy

    from project3_cuda_path_tracer_tpu.models.scene import derive_camera

    s = copy.copy(scene)
    s.state = copy.copy(scene.state)
    cam = scene.state.camera
    s.state.camera = derive_camera(
        res,
        cam.position,
        cam.look_at,
        np.array([0, 1, 0], np.float32),
        float(cam.fov[1]),
        cam.aperture,
        cam.focal_distance,
    )
    return s


def run_with_big_stack(fn, stack_bytes=1 << 31):
    """Run fn() on a thread with a huge stack and return its result.

    XLA:CPU traces+compiles on the CALLING thread; programs that embed
    several routing networks (sharded interpret-mode pipeline runs)
    recurse deeper than the main thread's stack can reliably grow
    mid-suite (mappings can block main-stack growth even with a raised
    RLIMIT_STACK — the full-suite-only segfault in
    test_mesh_scene_pallas_under_shard_map). A fresh pthread gets its
    stack up front: explicitly here, and via the csrc/bigstack.cpp
    LD_PRELOAD shim besides."""
    import threading

    out, err = [], []
    old = threading.stack_size(stack_bytes)
    try:
        def target():
            try:
                out.append(fn())
            except BaseException as e:  # re-raised on the caller
                err.append(e)

        t = threading.Thread(target=target)
        t.start()
        t.join()
    finally:
        threading.stack_size(old)
    if err:
        raise err[0]
    return out[0]


@pytest.fixture(autouse=True, scope="module")
def _reset_jax_between_modules():
    """Free live executables between test modules.

    XLA:CPU segfaults compiling LARGE programs (the routing-network
    pipeline/shard_map tests) once ~100+ programs were compiled earlier
    in the same process — measured: any alphabetical half of the suite
    passes, the full run crashes at whichever big compile comes ~test
    120, on a 2 GB-stack thread, with 126 GB RAM free. Dropping live
    executables (and their interpret-mode callbacks) between modules
    keeps the in-process compiler state below the cliff; the persistent
    cache (/tmp/jax_cache_pt_tpu) makes the recompiles cheap."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
