"""Native (C++) component loader: compile-on-demand via g++, bind via
ctypes.

The reference's host runtime is C++ (SURVEY.md §2); on TPU the compute
tier is XLA/Pallas, but host-side heavy lifting (BVH builds over large
meshes) stays native. Shared objects are built once into
~/.cache/pt_tpu_native/ keyed by source mtime; every native entry point
has a pure-numpy fallback, so a missing toolchain degrades gracefully.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import Optional

log = logging.getLogger("pathtracer.native")

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)
_CACHE = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "pt_tpu_native",
)

_loaded: dict = {}


def _compile(src_name: str, tag: str) -> Optional[str]:
    src = os.path.join(_CSRC, src_name)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_CACHE, exist_ok=True)
    so_path = os.path.join(_CACHE, f"{tag}-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = [
        "g++",
        "-O2",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        so_path,
        src,
        "-ldl",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.warning("native build of %s failed (%s); using numpy fallback", src_name, e)
        return None
    return so_path


def load_obj_loader():
    """ctypes handle to csrc/obj_loader.cpp (obj_count_tris/obj_load),
    or None; models/mesh.py falls back to the Python parser."""
    if "obj" in _loaded:
        return _loaded["obj"]
    so = _compile("obj_loader.cpp", "obj_loader")
    lib = None
    if so:
        try:
            lib = ctypes.CDLL(so)
            lib.obj_count_tris.restype = ctypes.c_int32
            lib.obj_count_tris.argtypes = [ctypes.c_char_p]
            lib.obj_load.restype = ctypes.c_int32
        except OSError as e:
            log.warning("loading %s failed: %s", so, e)
            lib = None
    _loaded["obj"] = lib
    return lib


def bigstack_preload_path() -> Optional[str]:
    """Path to the pthread big-stack LD_PRELOAD shim (csrc/bigstack.cpp),
    building it on demand; None if the toolchain is missing.

    Consumed by tests/conftest.py: XLA:CPU compile threads overflow
    their 8 MB stacks on programs embedding several routing networks
    (the in-tile radix/sorted-stream programs) — the shim docstring
    has the full analysis.
    Not needed on TPU (Mosaic)."""
    return _compile("bigstack.cpp", "bigstack")


def load_bvh_builder():
    """ctypes handle to csrc/bvh_builder.cpp's build_bvh, or None."""
    if "bvh" in _loaded:
        return _loaded["bvh"]
    so = _compile("bvh_builder.cpp", "bvh_builder")
    lib = None
    if so:
        try:
            lib = ctypes.CDLL(so)
            lib.build_bvh.restype = ctypes.c_int32
        except OSError as e:
            log.warning("loading %s failed: %s", so, e)
            lib = None
    _loaded["bvh"] = lib
    return lib
