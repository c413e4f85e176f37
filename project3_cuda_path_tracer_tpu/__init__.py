"""project3_cuda_path_tracer_tpu — a TPU-native wavefront path tracer.

A from-scratch rebuild of the capability surface of
CIS565-Fall-2017/Project3-CUDA-Path-Tracer (reference at /root/reference)
designed TPU-first: the per-bounce CUDA kernel trio (raygen, intersect,
shade/scatter) becomes a fixed-shape SoA path-pool pipeline under one
`jax.jit`, with the depth loop as `lax.scan`, intersection sweeps as
Pallas TPU kernels, stream compaction as cumsum permutations, and
multi-chip scaling via `shard_map` over a `jax.sharding.Mesh`.

Reference behavioral contracts are cited per-module as file:line into
/root/reference.
"""

__version__ = "0.1.0"

from .models.scene import Scene, load_scene  # noqa: F401
from .render import Renderer, RenderSettings, render_iteration  # noqa: F401
