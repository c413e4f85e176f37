"""Multi-chip scaling (shard_map over jax.sharding.Mesh).

The reference is single-process/single-GPU (SURVEY.md §2 parallelism
checklist); the natural TPU scale-out axes are sample batches and pixel
tiles, with accumulator psum over ICI.
"""

from .shard import (  # noqa: F401
    make_mesh,
    render_iteration_sharded,
)
