"""Multi-chip rendering: shard_map over a jax.sharding.Mesh.

The reference renders on one GPU (device 0 hardcoded,
/root/reference/src/preview.cpp:107). The TPU-native scale-out replaces
"one big GPU" with N chips along two embarrassingly-parallel axes:

- "spp" (sample batches): every device traces the SAME pixels with a
  DIFFERENT iteration id (the RNG seed separates streams per
  src/pathtrace.cu:41-45), and a single `psum` over ICI reduces the
  radiance into the replicated accumulator. One collective per call —
  the NCCL-equivalent the reference never needed (SURVEY.md §5).
- "px" (pixel tiles): the path pool is split across devices; each device
  owns a contiguous slice of pixels and its slice of the accumulator.
  Zero collectives in steady state; display gathers lazily.

A 2D mesh ("spp","px") composes both. All shardings are expressed with
jax.sharding + shard_map so XLA inserts the collectives.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.device import DeviceCamera, DeviceScene
from ..ops.intersect import Intersections
from ..ops.vec import Vec3
from ..render import RenderSettings, _scatter_add, trace_paths


def make_mesh(
    shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("spp",),
    devices: Optional[list] = None,
) -> Mesh:
    """Build a Mesh; shape -1 entries absorb remaining devices."""
    devs = devices if devices is not None else jax.devices()
    shape = list(shape)
    known = int(np.prod([s for s in shape if s > 0])) or 1
    for i, s in enumerate(shape):
        if s == -1:
            shape[i] = len(devs) // known
    n = int(np.prod(shape))
    return Mesh(np.asarray(devs[:n]).reshape(shape), tuple(axis_names))


def _empty_cache(n: int) -> Intersections:
    return Intersections(
        t=jnp.zeros((n,), jnp.float32),
        normal=Vec3.zeros((n,)),
        material_id=jnp.zeros((n,), jnp.int32),
        outside=jnp.zeros((n,), bool),
    )


@functools.partial(
    jax.jit,
    static_argnames=("settings", "mesh", "spp_axis", "px_axis"),
    donate_argnames=("accum",),
)
def render_iteration_sharded(
    scene: DeviceScene,
    cam: DeviceCamera,
    accum: jnp.ndarray,  # (P,3); sharded over px axis if present
    iteration: jnp.ndarray,  # scalar int32: index of this *call* (1-based)
    settings: RenderSettings,
    mesh: Mesh,
    spp_axis: Optional[str] = "spp",
    px_axis: Optional[str] = None,
):
    """One sharded render call.

    With an spp axis of size S, this advances the effective sample count
    by S (device d traces iteration (iteration-1)*S + d + 1), so the
    caller's accumulator divide-by-samples uses iteration*S.

    First-bounce caching is a per-device optimization skipped here (the
    cache pytree would need to live sharded; sample-sharded devices see
    different iterations anyway).
    """
    n_spp = mesh.shape[spp_axis] if spp_axis and spp_axis in mesh.shape else 1
    resx, resy = cam.resolution
    n_pixels = resx * resy
    if px_axis:
        n_px = mesh.shape[px_axis]
        if n_pixels % n_px != 0:
            raise ValueError(
                f"pixel count {n_pixels} ({resx}x{resy}) is not divisible by "
                f"the '{px_axis}' mesh dimension {n_px}; choose a resolution "
                f"or mesh shape so every device owns an equal pixel slice"
            )

    pool_spec = P(px_axis) if px_axis else P()
    accum_spec = pool_spec

    def body(accum_local):
        # Device-local pixel slice (global ids).
        if px_axis:
            n_px_shards = jax.lax.axis_size(px_axis)
            px_idx = jax.lax.axis_index(px_axis)
            local_n = n_pixels // n_px_shards
            offset = px_idx * local_n
        else:
            local_n = n_pixels
            offset = jnp.int32(0)
        pix = offset + jnp.arange(local_n, dtype=jnp.int32)

        # Device-local sample id.
        if spp_axis and n_spp > 1:
            s_idx = jax.lax.axis_index(spp_axis)
            it = (iteration - 1) * n_spp + s_idx + 1
        else:
            it = iteration

        radiance, pix_out, _, _ = trace_paths(
            scene, cam, it.astype(jnp.int32), _empty_cache(local_n),
            settings, False, pix,
        )

        if settings.sort_by_material or settings.compact:
            local_slot = pix_out - offset
            summed = _scatter_add(Vec3.zeros((local_n,)), local_slot, radiance)
        else:
            summed = radiance

        if spp_axis and n_spp > 1:
            summed = jax.lax.psum(summed, spp_axis)
        return accum_local + summed

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(accum_spec,),
        out_specs=accum_spec,
        check_vma=False,
    )
    return fn(accum)


def shard_accumulator(accum: jnp.ndarray, mesh: Mesh, px_axis: str):
    """Place the accumulator sharded over pixel tiles."""
    return jax.device_put(accum, NamedSharding(mesh, P(px_axis)))


def replicate(tree, mesh: Mesh):
    """Replicate scene/camera pytrees across the mesh."""
    return jax.device_put(
        tree, NamedSharding(mesh, P())
    )
