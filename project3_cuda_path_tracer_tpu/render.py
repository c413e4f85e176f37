"""The render core: fixed-shape wavefront path-trace pipeline under jit.

This is the TPU-native rebuild of pathtrace()
(/root/reference/src/pathtrace.cu:284-393). The CUDA shape —
  generateRayFromCamera -> while(depth) { computeIntersections; shade }
  -> finalGather -> tonemap
— becomes:
  ops.camera.generate_rays -> lax.scan over depth of
  (ops.sweep.intersect_scene -> ops.bsdf.scatter with masked lanes)
  -> radiance accumulation, all inside ONE jax.jit.

Key translations (SURVEY.md §7):
- the path pool is pure SoA: every 3-vector is a Vec3 of dense (P,)
  lanes (ops/vec.py — (P,3) tensors tile-pad 3->128 on TPU, 42x HBM
  traffic),
- dying paths never change shapes: an `alive` mask plus optional
  sort-to-tail permutation replace thrust stream compaction
  (src/pathtrace.cu:313-317, INSTRUCTION.md:77),
- material sort is a `jnp.argsort` permutation of the pool keyed on
  materialId, toggleable (INSTRUCTION.md:80-86),
- first-bounce cache stores the depth-0 Intersections pytree, reused
  across iterations, invalidated by camera changes, disabled under AA
  jitter (INSTRUCTION.md:87-89,112-113),
- finalGather's scatter-add (src/pathtrace.cu:269-278) is a plain add
  when the pool is unpermuted (slot == pixel) and an indexed scatter-add
  otherwise,
- running-average tonemap matches sendImageToPBO (src/pathtrace.cu:48-68),
- N iterations run per dispatch via lax.fori_loop (render_batch): the
  reference pays a launch + full D2H copy per iteration
  (src/pathtrace.cu:389-390); we pay one dispatch per batch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from .models.device import (
    DeviceCamera,
    DeviceScene,
    camera_to_device,
    scene_to_device,
)
from .models.scene import GeomType, Scene, derive_camera
from .ops import rng
from .ops.bsdf import scatter
from .ops.camera import generate_rays
from .ops.intersect import Intersections
from .ops.sweep import intersect_scene
from .ops.vec import Vec3, take as vtake, where as vwhere
from .utils import image as image_io


@dataclass(frozen=True)
class RenderSettings:
    """Runtime toggles replacing the reference's rebuild-to-toggle macros
    (SURVEY.md §5 config/flag system; INSTRUCTION.md:80,87)."""

    trace_depth: int = 8
    sort_by_material: bool = False  # INSTRUCTION.md:80-86
    compact: bool = False  # stream compaction analog, INSTRUCTION.md:77
    cache_first_bounce: bool = False  # INSTRUCTION.md:87-89
    antialias: bool = False  # INSTRUCTION.md:112-113
    depth_of_field: bool = False  # INSTRUCTION.md:110-111
    russian_roulette: bool = False
    rr_start_depth: int = 3
    direct_lighting: bool = False  # NEE at the final bounce, INSTRUCTION.md:117
    nee_mis: bool = False  # NEE at EVERY diffuse bounce, MIS-weighted
    stratified: bool = False  # low-discrepancy hemisphere sampling, INSTRUCTION.md:122
    sobol: bool = False  # Owen-scrambled Sobol variant of the above
    # Model-parallel triangle sharding (--shard tri=N): the name of the
    # mesh axis whose devices each hold 1/N of every mesh's triangles.
    # Set by ShardedRenderer only; makes intersect_scene_any min-merge
    # its per-device result across the axis. Shading must see the
    # MERGED intersection, so the intersect+shade fused tiers are off;
    # eligible scenes ride the standalone shade kernel instead
    # (kernel_plan.shard_shade -> megakernel.shade_step_pallas).
    tri_axis: "str | None" = None
    motion_blur: bool = False  # per-iteration shutter time, INSTRUCTION.md:119
    use_bvh: bool = True  # hierarchical accel toggle, INSTRUCTION.md:133-140
    use_pallas: bool = False  # Pallas intersect kernel vs pure-XLA sweep

    def effective_cache(self) -> bool:
        # AA jitter invalidates a first-bounce cache (INSTRUCTION.md:112-113).
        return self.cache_first_bounce and not (
            self.antialias or self.depth_of_field
        )


# VMEM budget for the in-kernel mesh path: the packed (T/4,96) triangle
# table costs T x 128 B after lane padding, so 80k tris = 10.2 MB of the
# ~16 MB/core, leaving room for the chunk table + pool tiles. Bigger
# meshes take the XLA BVH path (guarded on TPU — see guard_tpu_mesh_path).
MAX_MK_TRIS = 80_000


@dataclass(frozen=True)
class KernelPlan:
    """Which Pallas kernel tier covers a (scene, settings) pair.

    THE single source of truth consumed by trace_paths (bounce kernel),
    render_batch (whole-iteration / fused-NEE kernels) and the TPU mesh
    guard — round 2 kept three hand-mirrored copies of these predicates
    and the advisor found two reachable disagreements (a mesh scene with
    --direct-lighting rode the megakernel for bounces but still ran a
    full-pool XLA mesh intersect in the final NEE step, and the guard
    hardcoded the small-body limit while render_batch read
    PT_TPU_WHOLE_KERNEL_MAX_BODY)."""

    textures_ok: bool  # no textures, in-kernel checker, or in-kernel
    # file-texture atlas fetch (megakernel.file_tex_ok)
    small_body: bool  # geoms x materials under the whole-kernel limit
    bounce_kernel: bool  # per-bounce megakernel eligible (trace_paths)
    mesh_pipeline: bool  # per-bounce global-compaction mesh pipeline
    whole_kernel: bool  # whole-iteration kernel eligible (render_batch)
    nee_kernel: bool  # fused NEE+MIS kernel eligible (render_batch)
    nee_bounce_kernel: bool  # per-bounce fused NEE (big bodies)
    # XLA-shading paths (file textures / bump / SSS / env maps / sort /
    # cache / NEE shadow rays) swap their full-pool intersect_scene for
    # the Pallas intersect pipeline — the mesh sweep that does not
    # crash the TPU worker (ops/pipeline.py::intersect_pipeline)
    pallas_isect: bool
    # --shard tri=N fused shading: shading consumes the axis-merged
    # Intersections through the standalone shade kernel
    # (megakernel.shade_step_pallas) instead of the XLA _shade_step —
    # tri-sharded renders keep an in-kernel shade tier (VERDICT r3 #4)
    shard_shade: bool
    # True iff ANY stage of this configuration would run a full-pool XLA
    # intersect_scene on a scene WITH mesh geometry — the access pattern
    # that crashes the TPU worker at large pools (the guard's predicate).
    xla_mesh_exposure: bool


def kernel_plan(scene: DeviceScene, settings: RenderSettings) -> KernelPlan:
    import os as _os

    from .ops.megakernel import checker_only as _checker_only
    from .ops.megakernel import file_tex_ok as _file_tex_ok

    n_tris = sum(c for _, c in scene.tri_ranges)
    has_mesh = n_tris > 0
    # in-kernel texturing: procedural checker (zero gathers) or file
    # textures/bump maps within the one-hot MXU atlas caps
    # (megakernel.file_tex_ok); mesh-UV file-texture scenes shade in
    # XLA over the Pallas intersect pipeline
    textures_ok = (
        not scene.any_textured
        or _checker_only(scene)
        or _file_tex_ok(scene)
    )
    bump_ok = not scene.any_bump or _file_tex_ok(scene)
    max_body = int(_os.environ.get("PT_TPU_WHOLE_KERNEL_MAX_BODY", "128"))
    small_body = (
        scene.transform.shape[0] * max(scene.mat_emittance.shape[0], 1)
        <= max_body
    )
    from .ops.pipeline import MAX_PIPE_TRIS

    # lat-long ENVMAP fetch runs in-kernel via the one-hot atlas gather
    # (megakernel._env_fetch); PT_TPU_ENVMAP_KERNEL=0 restores the XLA
    # fallback (escape hatch if a Mosaic build lacks atan2/acos)
    envmap_ok = (
        not scene.has_env_map
        or _os.environ.get("PT_TPU_ENVMAP_KERNEL", "1") != "0"
    )
    common = (
        settings.use_pallas
        and textures_ok
        and bump_ok
        and not scene.any_sss
        and envmap_ok
        # --shard tri=N: intersect+shade cannot fuse (shading must
        # consume the axis-MERGED intersection); the split tiers
        # (pallas_isect + shard_shade) cover it instead
        and settings.tri_axis is None
    )
    bounce_kernel = (
        common
        and not has_mesh
        and not settings.sort_by_material
        and not settings.nee_mis
    )
    # Mesh scenes take the per-bounce global-compaction pipeline
    # (ops/pipeline.py): candidates from the whole pool pack into dense
    # full-width tiles, so the hierarchical sweep runs at ~100%
    # occupancy instead of one mostly-empty (8,128) group per tile.
    # Above MAX_MK_TRIS its K2 streams the triangle table from HBM, so
    # the pipeline cap is the chunk-table VMEM ceiling (MAX_PIPE_TRIS).
    # The pipeline's K3 carries per-lane OBJ UVs through the dense
    # stream, so mesh-UV file-texture scenes (mesh_textured.txt) ride
    # it in-kernel even though the other fused kernels cannot
    # (file_tex_caps_ok vs file_tex_ok).
    from .ops.megakernel import file_tex_caps_ok as _file_tex_caps_ok

    pipe_tex_ok = (
        not scene.any_textured
        or _checker_only(scene)
        or _file_tex_caps_ok(scene)
    )
    pipe_bump_ok = not scene.any_bump or _file_tex_caps_ok(scene)
    mesh_pipeline = (
        settings.use_pallas
        and pipe_tex_ok
        and pipe_bump_ok
        and not scene.any_sss
        and envmap_ok
        and settings.tri_axis is None
        and has_mesh
        and n_tris <= MAX_PIPE_TRIS
        and not settings.sort_by_material
        and not settings.nee_mis
    )
    whole_kernel = (
        common
        and small_body
        and not has_mesh
        and not settings.sort_by_material
        and not settings.compact
        and not settings.effective_cache()
        and not settings.direct_lighting
        and not settings.nee_mis
        and not settings.motion_blur
    )
    nee_kernel = (
        common
        and settings.nee_mis
        and small_body
        and n_tris <= MAX_MK_TRIS  # in-tile _mesh_test: VMEM-resident
        and len(scene.emissive_geoms) > 0
        and not settings.sort_by_material
        and not settings.compact
        and not settings.effective_cache()
        and not settings.motion_blur
    )
    # Big-body fallback: the same fused estimator one bounce per kernel
    # (config 5's 38x32 body collapses the whole-iteration form); the
    # MIS aux rides as two extra pool lanes between bounces.
    nee_bounce_kernel = (
        common
        and settings.nee_mis
        and not nee_kernel
        and n_tris <= MAX_MK_TRIS
        and len(scene.emissive_geoms) > 0
        and not settings.sort_by_material
        and not settings.compact
        and not settings.effective_cache()
    )
    # The intersect-only pipeline needs no texture/bump/SSS/env checks —
    # it replaces ONLY the intersect; shading stays XLA.
    pallas_isect = (
        settings.use_pallas and has_mesh and n_tris <= MAX_PIPE_TRIS
    )
    # Tri-sharded fused shade: intersect per-device (pallas_isect) +
    # axis min-merge, then megakernel.shade_step_pallas over the merged
    # pool. Same shading-capability gates as the mesh pipeline's K3
    # (it IS _shade_values); NEE/sort keep the XLA estimator (NEE's
    # shadow rays re-intersect and would miss other devices' slices).
    shard_shade = (
        settings.use_pallas
        and settings.tri_axis is not None
        and pipe_tex_ok
        and pipe_bump_ok
        and not scene.any_sss
        and envmap_ok
        and not settings.sort_by_material
        and not settings.nee_mis
    )
    if settings.nee_mis:
        covered = nee_kernel or nee_bounce_kernel
    else:
        # the bounce loop rides the kernels, but a first-bounce cache
        # computes depth 0 via XLA intersect_scene and --direct-lighting
        # runs the final shadow ray through it (render._nee_final_step)
        covered = (
            (bounce_kernel or mesh_pipeline)
            and not settings.effective_cache()
            and not settings.direct_lighting
        )
    return KernelPlan(
        textures_ok=textures_ok,
        small_body=small_body,
        bounce_kernel=bounce_kernel,
        mesh_pipeline=mesh_pipeline,
        whole_kernel=whole_kernel,
        nee_kernel=nee_kernel,
        nee_bounce_kernel=nee_bounce_kernel,
        pallas_isect=pallas_isect,
        shard_shade=shard_shade,
        # every remaining XLA intersect call site dispatches through
        # intersect_scene_any, so mesh exposure exists only when the
        # Pallas intersect itself is ineligible
        xla_mesh_exposure=has_mesh and not covered and not pallas_isect,
    )


def guard_tpu_mesh_path(scene: DeviceScene, settings: RenderSettings,
                        pixel_count: int):
    """Fail fast instead of wedging the TPU: the XLA mesh paths
    (per-lane BVH gathers / naive (8,P) broadcast sweep) crash the
    TPU worker at large pool sizes (measured round 2: mesh.txt at
    800x800 = ~6 min of compile then a worker fault with an
    hour-scale tunnel recovery; 128x128 survives). When a mesh
    configuration is not fully covered by the Pallas kernels
    (kernel_plan.xla_mesh_exposure) and the pool is large, refuse with
    an actionable message rather than crash. Called by Renderer AND
    ShardedRenderer (the advisor found the sharded path bypassed it).
    Override with PT_TPU_ALLOW_XLA_MESH=1 to experiment."""
    import os as _os

    if _os.environ.get("PT_TPU_ALLOW_XLA_MESH") == "1":
        return
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return
    if platform == "cpu":
        return
    plan = kernel_plan(scene, settings)
    if not plan.xla_mesh_exposure:
        return
    if pixel_count <= 200_000:  # 128x128-class pools survive (measured)
        return
    n_tris = sum(c for _, c in scene.tri_ranges)
    why = (
        f"{n_tris} triangles exceed the Pallas kernel's {MAX_MK_TRIS} "
        f"VMEM budget" if n_tris > MAX_MK_TRIS else
        "--no-pallas forces the full-pool XLA mesh intersect (every "
        "other configuration now rides the Pallas intersect pipeline)"
    )
    raise RuntimeError(
        f"refusing to compile the XLA mesh path on the TPU backend "
        f"at {pixel_count} pixels: it crashes the TPU worker at large "
        f"pool sizes ({why}). Render at <= 200k pixels, use "
        f"--pallas with <= {MAX_MK_TRIS} triangles, or set "
        f"PT_TPU_ALLOW_XLA_MESH=1 to bypass this guard."
    )


def _merge_isect_axis(isect, axis):
    """Min-t merge of per-device Intersections across a tri-sharded
    mesh axis (--shard tri=N): each device intersected a disjoint
    (padded-by-duplicates) triangle slice, so the global hit is the
    arg-min of positive t over the axis. Ties pick the lowest device =
    the lowest original triangle index — the same winner as the
    sequential front-to-back sweep's strict-< update, so the merged
    render is bit-identical to the unsharded one. all_gather over the
    small axis + a static select chain (no per-lane gathers — the TPU
    layout rules of ops/vec.py)."""
    n = jax.lax.axis_size(axis)
    if n == 1:
        return isect
    g = lambda a: jax.lax.all_gather(a, axis)
    key = jnp.where(isect.t > 0, isect.t, jnp.float32(3.4e38))
    best = jnp.argmin(g(key), axis=0)

    def pick(a):
        ga = g(a)
        out = ga[0]
        for d in range(1, n):
            out = jnp.where(best == d, ga[d], out)
        return out

    from .ops.intersect import Intersections

    return Intersections(
        t=pick(isect.t),
        normal=Vec3(pick(isect.normal.x), pick(isect.normal.y),
                    pick(isect.normal.z)),
        material_id=pick(isect.material_id),
        outside=pick(isect.outside),
        tex_u=pick(isect.tex_u),
        tex_v=pick(isect.tex_v),
        has_uv=pick(isect.has_uv),
    )


def intersect_scene_any(origins, dirs, scene, settings, alive=None):
    """intersect_scene with the Pallas mesh pipeline swapped in when
    eligible (kernel_plan.pallas_isect): identical Intersections
    contract, mesh sweep in-kernel, per-corner mesh UVs included —
    the dispatch that removed most of the TPU mesh guard's territory
    (file textures, bump, SSS, env maps, sort, cache, NEE shadows).

    Under --shard tri=N (settings.tri_axis) the device-local result is
    min-merged across the mesh axis — ONE chokepoint covers every
    caller (bounce, NEE shadow rays, direct-lighting final, cache)."""
    if kernel_plan(scene, settings).pallas_isect:
        from .ops.pipeline import intersect_pipeline

        if alive is None:
            alive = jnp.ones(origins.x.shape, bool)
        isect = intersect_pipeline(origins, dirs, alive, scene)
    else:
        isect = intersect_scene(
            origins, dirs, scene, use_bvh=settings.use_bvh
        )
    if settings.tri_axis is not None:
        isect = _merge_isect_axis(isect, settings.tri_axis)
    return isect


def _gather_materials(scene: DeviceScene, mat_id: jnp.ndarray):
    safe = jnp.maximum(mat_id, 0)
    takes = lambda a: jnp.take(a, safe, axis=0)
    return (
        vtake(scene.mat_color, safe),
        vtake(scene.mat_specular_color, safe),
        takes(scene.mat_has_reflective),
        takes(scene.mat_has_refractive),
        takes(scene.mat_ior),
        takes(scene.mat_emittance),
        takes(scene.mat_specular_exponent) if scene.any_glossy else None,
        takes(scene.mat_sss) if scene.any_sss else None,
    )


def _shade_step(state, isect: Intersections, scene, iteration, depth, settings,
                add_emission: bool = True, textured_color: Vec3 | None = None):
    """One masked shading step over the whole pool.

    add_emission=False: emissive hits still terminate their lanes but
    contribute nothing here — the caller has already added the (MIS-
    weighted) emitted term (_nee_mis_bounce).

    textured_color: the caller already ran apply_textures and passes
    the textured albedo; isect.normal is then trusted as-is (it may be
    bump-perturbed). Without this, a bump-mapped --nee render perturbed
    the shading normal twice — once in _nee_mis_bounce and again here
    (round-2 advisor finding).

    RNG draws are scene-specialized (SURVEY.md §7 RNG contract kept —
    (iter, pixelIndex, depth) seeding): the hemisphere always costs 2
    draws; the spec/diffuse lottery, Fresnel lottery and Russian
    roulette each cost one more only if the scene/settings can take
    that branch. Cornell (pure 0/1 REFL, no glass, no RR) draws 2
    instead of 5 — the LCG is the main integer-ALU cost per bounce.
    """
    origins, dirs, throughput, radiance, alive, pix = state
    hit = isect.t > 0.0

    if (scene.has_env_const or scene.has_env_map) and add_emission:
        # Escaped rays collect the environment radiance, then die
        # (extension of the black-background miss rule,
        # src/pathtrace.cu:262-264). Skipped under add_emission=False:
        # the NEE/MIS caller adds it itself (always full weight — light
        # sampling never samples the environment).
        from .ops.texture import env_radiance

        env = env_radiance(scene, dirs)
        escaped = alive & ~hit
        radiance = radiance + vwhere(
            escaped, throughput * env, Vec3.zeros(pix.shape)
        )

    n_draws = 2
    slot_branch = slot_fresnel = slot_rr = None
    if scene.any_partial_reflective:
        slot_branch = n_draws
        n_draws += 1
    if scene.any_refractive:
        slot_fresnel = n_draws
        n_draws += 1
    if settings.russian_roulette:
        slot_rr = n_draws
        n_draws += 1
    u = rng.uniforms(iteration, pix, depth, n_draws)
    if settings.stratified or settings.sobol:
        # Better hemisphere sampling (INSTRUCTION.md:122): at depth 0
        # the hemisphere pair comes from the rotated R2 lattice (or the
        # Owen-scrambled Sobol sequence with --sobol); deeper bounces
        # keep independent draws (padded QMC — see ops/rng.py for why
        # the sequences must not repeat across depths).
        _pair = rng.sobol_pair if settings.sobol else rng.stratified_pair
        s1, s2 = _pair(iteration, pix, 0)
        is_d0 = jnp.asarray(depth) == 0
        u = (
            jnp.where(is_d0, s1, u[0]),
            jnp.where(is_d0, s2, u[1]),
        ) + u[2:]

    mats = _gather_materials(scene, isect.material_id)
    normal = isect.normal
    if textured_color is not None:
        mats = (textured_color,) + mats[1:]
    elif scene.any_textured or scene.any_bump:
        from .ops.texture import apply_textures

        p_hit = origins + dirs * (isect.t - 1e-4)
        color, normal = apply_textures(
            scene, p_hit, normal, isect.material_id, mats[0],
            tex_u=isect.tex_u, tex_v=isect.tex_v, has_uv=isect.has_uv,
        )
        mats = (color,) + mats[1:]
    new_origin, new_dir, tint, emitted, at_light = scatter(
        origins,
        dirs,
        isect.t,
        normal,
        isect.outside,
        *mats[:7],
        u_hemi1=u[0],
        u_hemi2=u[1],
        u_branch=None if slot_branch is None else u[slot_branch],
        u_fresnel=None if slot_fresnel is None else u[slot_fresnel],
        m_sss=mats[7],
        t_segment=isect.t,
    )

    live_hit = alive & hit
    # Light hit: contribute throughput * (color*emittance), terminate
    # (src/pathtrace.cu:247-249 generalized to full path tracing).
    lit = live_hit & at_light
    if add_emission:
        radiance = radiance + vwhere(
            lit, throughput * emitted, Vec3.zeros(pix.shape)
        )
    cont = live_hit & ~at_light
    throughput = vwhere(cont, throughput * tint, throughput)

    if settings.russian_roulette:
        # Kill low-throughput paths with survival prob = max component,
        # compensating survivors (probability-division contract,
        # src/interactions.h:55-62 applied to termination).
        p_survive = jnp.clip(throughput.max_component(), 0.05, 1.0)
        do_rr = cont & (depth >= settings.rr_start_depth)
        killed = do_rr & (u[slot_rr] >= p_survive)
        throughput = vwhere(do_rr, throughput * (1.0 / p_survive), throughput)
        cont = cont & ~killed

    alive = cont
    origins = vwhere(alive, new_origin, origins)
    dirs = vwhere(alive, new_dir, dirs)
    return (origins, dirs, throughput, radiance, alive, pix)


NEE_STREAM = 254  # RNG depth-slot for light sampling (see rng.RAYGEN_STREAM)
TIME_STREAM = 253  # RNG depth-slot for the motion-blur shutter sample
NEE_DEPTH_BASE = 128  # per-bounce NEE draws use stream 128+depth (nee_mis)


def _nee_final_step(state, scene, iteration, settings):
    """Final bounce with explicit light sampling (ops/lights.py):
    emissive direct hits contribute as usual; surviving DIFFUSE lanes
    trade their hopeless last hemisphere sample for one shadow ray to a
    sampled light point. All lanes terminate after this."""
    from .ops.lights import sample_lights

    origins, dirs, throughput, radiance, alive, pix = state
    isect = intersect_scene_any(origins, dirs, scene, settings, alive=alive)
    hit = isect.t > 0.0
    m_color, m_spec, m_refl, m_refr, m_ior, m_emit, _sexp, _sss = (
        _gather_materials(scene, isect.material_id)
    )

    if scene.has_env_const or scene.has_env_map:
        from .ops.texture import env_radiance

        radiance = radiance + vwhere(
            alive & ~hit,
            throughput * env_radiance(scene, dirs),
            Vec3.zeros(pix.shape),
        )

    live_hit = alive & hit
    lit = live_hit & (m_emit > 0.0)
    radiance = radiance + vwhere(
        lit, throughput * (m_color * m_emit), Vec3.zeros(pix.shape)
    )

    diffuse = live_hit & (m_emit <= 0.0) & (m_refl <= 0.0) & (m_refr <= 0.0)
    p_hit = origins + dirs * (isect.t - 1e-4)

    u = rng.uniforms(iteration, pix, NEE_STREAM, 3)
    lp, ln, weight, le = sample_lights(scene, u[0], u[1], u[2])

    to_l = lp - p_hit
    r2 = jnp.maximum(to_l.length_sq(), 1e-8)
    r = jnp.sqrt(r2)
    wi = to_l * (1.0 / r)
    cos_s = jnp.maximum(isect.normal.dot(wi), 0.0)
    cos_l = jnp.maximum(-ln.dot(wi), 0.0)

    shadow = intersect_scene_any(p_hit, wi, scene, settings, alive=alive)
    visible = (shadow.t < 0.0) | (shadow.t >= r - 1e-2)

    g = cos_s * cos_l / r2 * weight * (1.0 / jnp.pi)
    contrib = throughput * m_color * le * g
    take = diffuse & visible & (cos_s > 0) & (cos_l > 0)
    radiance = radiance + vwhere(take, contrib, Vec3.zeros(pix.shape))

    dead = jnp.zeros(pix.shape, bool)
    return (origins, dirs, throughput, radiance, dead, pix)


def _nee_mis_bounce(state, aux, scene, iteration, depth, settings, is_last):
    """One bounce of the NEE-at-every-diffuse-vertex estimator with
    multiple importance sampling (power heuristic, beta=2).

    Extends INSTRUCTION.md:117-118 beyond final-bounce-only: at every
    diffuse vertex one area-sampled shadow ray contributes
        throughput * albedo/pi * G * Le * (A*n) * w_light,
    and when the BSDF-sampled continuation ray hits an emitter the
    emitted term is weighted by w_bsdf — the two weights for a given
    light direction sum to 1, so the estimator stays unbiased while the
    small-light variance collapses. Both pdfs are compared in solid
    angle: pdf_light = r^2 / (A*n*cos_l), pdf_bsdf = cos_s/pi (the
    cosine hemisphere the diffuse BSDF samples).

    Vertices with ANY non-delta lobe take the light sample: pure
    diffuse, Phong-glossy (SPECEX>0), and partial-reflective mixes all
    contribute through their implied mixed BRDF (see the NEE section
    below). Only delta lobes skip — SPECEX==0 mirrors and refraction —
    and their continuation rays keep FULL weight at emissive hits
    (aux.prev_nondelta=False): plain path tracing for those lanes, no
    double counting. SSS lanes also skip (their transport is not a
    surface BRDF).

    aux = (prev_pdf_bsdf (P,), prev_nondelta (P,) bool). is_last: no
    continuation ray exists, so the light sample takes full weight and
    every lane terminates (the _nee_final_step contract, MIS-corrected).

    PATH-LENGTH SEMANTIC: the final light connection adds one segment,
    so a D-bounce nee_mis render integrates the same path space as a
    (D+1)-bounce brute-force render (exactly, for all-diffuse scenes;
    specular tails of length D+1 are the only paths brute-D+1 has that
    nee-D lacks). This is the reference's "take a FINAL ray directly to
    a light" contract (INSTRUCTION.md:117-118) applied at every vertex.
    Verified empirically: all-diffuse Cornell 16x16, nee(D=5) vs
    brute(D=6) 16k-spp truth -> signed error -0.0006 (noise floor),
    MAD 0.0058 vs brute-1024spp's 0.0140 at equal spp.
    """
    from .ops.lights import sample_lights

    origins, dirs, throughput, radiance, alive, pix = state
    prev_pdf, prev_diffuse = aux

    isect = intersect_scene_any(origins, dirs, scene, settings, alive=alive)
    hit = isect.t > 0.0
    live_hit = alive & hit
    mats = _gather_materials(scene, isect.material_id)
    (m_color, m_spec, m_refl, m_refr, m_ior, m_emit, _sexp, m_sss) = mats
    normal = isect.normal
    if scene.any_textured or scene.any_bump:
        from .ops.texture import apply_textures

        p_tex = origins + dirs * (isect.t - 1e-4)
        m_color, normal = apply_textures(
            scene, p_tex, normal, isect.material_id, m_color,
            tex_u=isect.tex_u, tex_v=isect.tex_v, has_uv=isect.has_uv,
        )

    if scene.has_env_const or scene.has_env_map:
        from .ops.texture import env_radiance

        env = env_radiance(scene, dirs)
        escaped = alive & ~hit
        radiance = radiance + vwhere(
            escaped, throughput * env, Vec3.zeros(pix.shape)
        )

    # --- emissive hit: MIS-weighted by the previous vertex's strategy ---
    lit = live_hit & (m_emit > 0.0)
    area_weight = _lights_area_weight(scene)  # mean light area * n_lights
    cos_l_hit = jnp.abs(normal.dot(dirs))
    pdf_light_hit = (isect.t * isect.t) / jnp.maximum(
        cos_l_hit * area_weight, 1e-8
    )
    w_bsdf = jnp.where(
        prev_diffuse,
        (prev_pdf * prev_pdf)
        / jnp.maximum(prev_pdf * prev_pdf + pdf_light_hit * pdf_light_hit, 1e-20),
        1.0,
    )
    emitted = m_color * m_emit
    radiance = radiance + vwhere(
        lit, throughput * emitted * w_bsdf, Vec3.zeros(pix.shape)
    )

    # --- NEE shadow ray at every vertex with a NON-DELTA lobe ---
    # The BSDF sampling model (ops/bsdf.py::scatter) implies a mixed
    # BRDF per lane:
    #   f(wi) = (1-p) * albedo/pi
    #         + p * [SPECEX>0 ? spec * pdf_lobe(wi)/cos_s : delta]
    # with p = clip(REFL,0,1) and pdf_lobe the Phong power-cosine lobe
    # around the mirror direction ((n+1)/2pi * cos^n(alpha)). Round 2
    # sampled lights only at pure-diffuse vertices; glossy and
    # partial-reflective lanes now take the same light sample weighted
    # by their implied BRDF (VERDICT r2 missing #4 / next #5,
    # INSTRUCTION.md:117-118). Delta lobes (SPECEX==0 mirrors,
    # refraction) still skip — a light sample can never land on them.
    p_mix = jnp.clip(m_refl, 0.0, 1.0)
    glossy_ok = _sexp is not None
    n_exp = _sexp if glossy_ok else None
    nee_able = live_hit & (m_emit <= 0.0) & (m_refr <= 0.0)
    if m_sss is not None:
        nee_able = nee_able & (m_sss <= 0.0)
    has_diffuse_lobe = p_mix < 1.0
    has_glossy_lobe = (
        (p_mix > 0.0) & (n_exp > 0.0) if glossy_ok
        else jnp.zeros(pix.shape, bool)
    )
    nee_able = nee_able & (has_diffuse_lobe | has_glossy_lobe)

    p_hit = origins + dirs * (isect.t - 1e-4)
    ul = rng.uniforms(iteration, pix, NEE_DEPTH_BASE + depth, 3)
    lp, ln, weight, le = sample_lights(scene, ul[0], ul[1], ul[2])
    to_l = lp - p_hit
    r2 = jnp.maximum(to_l.length_sq(), 1e-8)
    r = jnp.sqrt(r2)
    wi = to_l * (1.0 / r)
    cos_s = jnp.maximum(normal.dot(wi), 0.0)
    cos_l = jnp.maximum(-ln.dot(wi), 0.0)
    shadow = intersect_scene_any(p_hit, wi, scene, settings, alive=alive)
    visible = (shadow.t < 0.0) | (shadow.t >= r - 1e-2)

    # Phong lobe pdf of the light direction (glossy lanes)
    from .ops.bsdf import reflect as _reflect

    mirror = _reflect(dirs, normal)
    if glossy_ok:
        cos_a = jnp.maximum(mirror.dot(wi), 0.0)
        pdf_lobe = jnp.where(
            has_glossy_lobe,
            (n_exp + 1.0) * (0.5 / jnp.pi) * jnp.power(cos_a, n_exp),
            0.0,
        )
    else:
        pdf_lobe = jnp.zeros(pix.shape, jnp.float32)

    # MIS weight: BOTH sides must use the same pdf_light MODEL for the
    # partition-of-unity to hold; the emissive-hit side can't know which
    # light it hit, so both use the mean-area model (area_weight). The
    # true per-light pdf (`weight`) still divides the contribution — an
    # approximate weighting function keeps the estimator unbiased as
    # long as w_light(w) + w_bsdf(w) = 1, which sharing the model gives.
    pdf_light_sa = r2 / jnp.maximum(cos_l * area_weight, 1e-8)
    pdf_bsdf_sa = (1.0 - p_mix) * cos_s * (1.0 / jnp.pi) + p_mix * pdf_lobe
    if is_last:
        w_light = jnp.ones_like(cos_s)  # no continuation competitor
    else:
        w_light = (pdf_light_sa * pdf_light_sa) / jnp.maximum(
            pdf_light_sa * pdf_light_sa + pdf_bsdf_sa * pdf_bsdf_sa, 1e-20
        )
    # geometric factor WITHOUT the BRDF; f folds in per lobe below
    g_geo = cos_s * cos_l / r2 * weight
    f_diff = m_color * ((1.0 - p_mix) * (1.0 / jnp.pi))
    f_spec_scale = p_mix * pdf_lobe / jnp.maximum(cos_s, 1e-6)
    f_mix = f_diff + m_spec * f_spec_scale
    contrib = throughput * f_mix * le * (g_geo * w_light)
    take = nee_able & visible & (cos_s > 0) & (cos_l > 0)
    radiance = radiance + vwhere(take, contrib, Vec3.zeros(pix.shape))

    if is_last:
        dead = jnp.zeros(pix.shape, bool)
        return (
            (origins, dirs, throughput, radiance, dead, pix),
            (jnp.zeros_like(prev_pdf), dead),
        )

    # --- BSDF continuation (the ordinary scatter step) ---
    state2 = (origins, dirs, throughput, radiance, alive, pix)
    isect2 = Intersections(
        t=isect.t, normal=normal, material_id=isect.material_id,
        outside=isect.outside, tex_u=isect.tex_u, tex_v=isect.tex_v,
        has_uv=isect.has_uv,
    )
    new_state = _shade_step(
        state2, isect2, scene, iteration, depth, settings,
        add_emission=False, textured_color=m_color,
    )
    n_origins, n_dirs, n_thr, n_rad, n_alive, _ = new_state

    # next-vertex MIS bookkeeping: pdf of the sampled direction under
    # the lane's mixed (diffuse + Phong) strategy. Lanes whose sample
    # came from a DELTA lobe (SPECEX==0 mirror pick) keep full weight
    # at the next emissive hit: detect by the sampled direction
    # coinciding with the mirror direction (exact for the mirror
    # branch; measure-zero false positives from the continuous lobes).
    cos_new = jnp.maximum(normal.dot(n_dirs), 0.0)
    next_pdf = (1.0 - p_mix) * cos_new * (1.0 / jnp.pi)
    if glossy_ok:
        cos_an = jnp.maximum(mirror.dot(n_dirs), 0.0)
        next_pdf = next_pdf + p_mix * jnp.where(
            has_glossy_lobe,
            (n_exp + 1.0) * (0.5 / jnp.pi) * jnp.power(cos_an, n_exp),
            0.0,
        )
    mirror_pick = (
        (p_mix > 0.0) & ~has_glossy_lobe
        & (mirror.dot(n_dirs) > 1.0 - 1e-6)
    )
    next_nondelta = nee_able & n_alive & ~mirror_pick
    return new_state, (next_pdf, next_nondelta)


def _lights_area_weight(scene: DeviceScene):
    """1/pdf of the (light, point) choice used by sample_lights: the
    chosen light's area x n_lights, reduced to ONE traced scalar: the
    mean light area x n_lights. Used only inside the MIS weighting
    function (both sides share it — see _nee_mis_bounce), never as a
    sampling pdf, so exactness per light is not required for
    unbiasedness."""
    lights = scene.emissive_geoms
    n = max(len(lights), 1)
    areas = []
    for gi in lights:
        xf = scene.transform[gi]
        if scene.gtypes[gi] == int(GeomType.SPHERE):
            s = jnp.sqrt(xf[0, 0] ** 2 + xf[1, 0] ** 2 + xf[2, 0] ** 2)
            areas.append(jnp.pi * s * s)
        else:
            c0 = jnp.stack([xf[0, 0], xf[1, 0], xf[2, 0]])
            c1 = jnp.stack([xf[0, 1], xf[1, 1], xf[2, 1]])
            c2 = jnp.stack([xf[0, 2], xf[1, 2], xf[2, 2]])
            cross = lambda a, b: jnp.stack(
                [
                    a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0],
                ]
            )
            norm = lambda v: jnp.sqrt(jnp.sum(v * v))
            areas.append(
                2.0
                * (norm(cross(c1, c2)) + norm(cross(c0, c2)) + norm(cross(c0, c1)))
            )
    if not areas:
        return jnp.float32(1.0)
    return sum(areas) / len(areas) * n


def _permute_state(state, perm):
    origins, dirs, throughput, radiance, alive, pix = state
    return (
        vtake(origins, perm),
        vtake(dirs, perm),
        vtake(throughput, perm),
        vtake(radiance, perm),
        jnp.take(alive, perm, axis=0),
        jnp.take(pix, perm, axis=0),
    )


def _permute_isect(isect: Intersections, perm) -> Intersections:
    return Intersections(
        t=jnp.take(isect.t, perm, axis=0),
        normal=vtake(isect.normal, perm),
        material_id=jnp.take(isect.material_id, perm, axis=0),
        outside=jnp.take(isect.outside, perm, axis=0),
        tex_u=jnp.take(isect.tex_u, perm, axis=0),
        tex_v=jnp.take(isect.tex_v, perm, axis=0),
        has_uv=jnp.take(isect.has_uv, perm, axis=0),
    )


def _maybe_sort_by_material(state, isect, settings):
    """Permute pool + intersections so equal-material lanes are contiguous
    (INSTRUCTION.md:80-86). Dead lanes sort to the tail (key INT32_MAX)."""
    if not settings.sort_by_material:
        return state, isect
    alive = state[4]
    key = jnp.where(alive & (isect.t > 0), isect.material_id, jnp.int32(2**31 - 1))
    perm = jnp.argsort(key, stable=True)
    return _permute_state(state, perm), _permute_isect(isect, perm)


def _maybe_compact(state, settings):
    """Stream compaction: live lanes packed to the front so tiled kernels
    can skip dead tiles via the traced alive count — the static-shape
    analog of thrust::partition (src/pathtrace.cu:313-317).

    Implemented as the classic exclusive-scan permutation (SURVEY.md §7):
    alive lane i goes to cumsum(alive)[i]-1, dead lane i goes to
    n_alive + cumsum(dead)[i]-1. One cumsum + one iota scatter builds the
    gather permutation; O(n), an order of magnitude cheaper than the
    argsort this replaces (TPU sorts are bitonic and slow)."""
    if not settings.compact:
        return state
    alive = state[4]
    P = alive.shape[0]
    a32 = alive.astype(jnp.int32)
    n_alive = jnp.sum(a32)
    front = jnp.cumsum(a32) - 1  # dest for alive lanes
    back = n_alive + jnp.cumsum(1 - a32) - 1  # dest for dead lanes
    dest = jnp.where(alive, front, back)
    # invert: perm[dest[i]] = i, then gather every pool array through it
    perm = jnp.zeros((P,), jnp.int32).at[dest].set(
        jnp.arange(P, dtype=jnp.int32), unique_indices=True
    )
    return _permute_state(state, perm)


def trace_paths(
    scene: DeviceScene,
    cam: DeviceCamera,
    iteration: jnp.ndarray,  # scalar int32, 1-based like the reference
    cache: Intersections,  # first-bounce cache (zeros when unused)
    settings: RenderSettings,
    use_cache: bool,
    pix: jnp.ndarray | None = None,
):
    """Trace one full sample for the given pixel ids (whole frame by
    default): raygen -> bounce loop -> per-path radiance.

    This is the shard-agnostic core; render_iteration wraps it for one
    device, parallel.shard wraps it under shard_map for a Mesh.

    Returns (radiance Vec3, pix_out (P,), depth0 Intersections,
    alive_counts (D,)). pix_out tracks pool permutations (sort/compact).
    """
    if (settings.nee_mis or settings.direct_lighting) and not scene.emissive_geoms:
        raise ValueError(
            "NEE/direct lighting needs an area light: no geom in this "
            "scene has an emissive material (EMITTANCE > 0). "
            "Environment-only scenes (e.g. scenes/env.txt) must render "
            "without --nee/--direct-lighting."
        )
    if settings.motion_blur:
        # One shutter-time sample per iteration ("averaging samples at
        # different times", INSTRUCTION.md:119-120). Geometry tables are
        # traced, so this re-uploads 2 small matrices — no recompile,
        # and the Pallas kernels read the moved tables from SMEM.
        from .models.device import advance_time

        t_shutter = rng.uniforms(
            iteration, jnp.zeros((1,), jnp.int32), TIME_STREAM, 1
        )[0][0]
        scene = advance_time(scene, t_shutter)

    # Pallas bounce megakernel: no material sort (intersect+shade are
    # fused, there is no between-point to sort at). Mesh scenes take the
    # per-bounce global-compaction pipeline (ops/pipeline.py) instead —
    # its K2 sweeps densely packed candidates at full (64,128) width.
    # Eligibility lives in ONE place: kernel_plan.
    plan = kernel_plan(scene, settings)
    use_mk = plan.bounce_kernel
    use_pipe = plan.mesh_pipeline
    n_pixels = cam.resolution[0] * cam.resolution[1] if pix is None else pix.shape[0]
    if use_pipe:
        pad = (-n_pixels) % (64 * 128)
    elif use_mk or plan.nee_bounce_kernel:
        pad = (-n_pixels) % (8 * 128)
    else:
        pad = 0
    # Fully-fused fast path: raygen + depth-0 bounce in one kernel
    # (zero pool reads). Needs the whole frame (pix derived from
    # program_id) and no first-bounce cache (the kernel never
    # materializes Intersections).
    fused_first = use_mk and pix is None and not settings.effective_cache()

    if fused_first:
        from .ops.megakernel import first_bounce_pallas, pack_camera

        state = first_bounce_pallas(
            scene,
            pack_camera(cam),
            iteration,
            settings,
            cam.resolution,
            pad,
        )
        P = n_pixels
        cache_out = _empty_cache(P)
    else:
        origins, dirs, pix = generate_rays(
            cam, iteration, settings.antialias, settings.depth_of_field, pix
        )
        P = pix.shape[0]
        throughput = Vec3.ones((P,))
        radiance = Vec3.zeros((P,))
        alive = jnp.ones((P,), bool)
        state = (origins, dirs, throughput, radiance, alive, pix)
        if pad:
            # Dead pad lanes: alive=False forever, radiance stays 0, pix=0
            # (their zero radiance lands harmlessly on pixel 0 in the
            # scatter path and is sliced off in the identity path).
            zf = lambda v: Vec3(
                jnp.concatenate([v.x, jnp.zeros((pad,), v.x.dtype)]),
                jnp.concatenate([v.y, jnp.zeros((pad,), v.y.dtype)]),
                jnp.concatenate([v.z, jnp.zeros((pad,), v.z.dtype)]),
            )
            state = (
                zf(origins),
                zf(dirs),
                zf(throughput),
                zf(radiance),
                jnp.concatenate([alive, jnp.zeros((pad,), bool)]),
                jnp.concatenate([pix, jnp.zeros((pad,), pix.dtype)]),
            )

    if settings.nee_mis:
        # NEE + MIS at every diffuse bounce: dedicated loop carrying the
        # previous vertex's BSDF pdf for the emissive-hit weighting.
        if (
            settings.sort_by_material
            or settings.compact
            or settings.effective_cache()
        ):
            raise ValueError(
                "nee_mis composes with AA/DoF/RR/stratified but not with "
                "sort/compact/first-bounce cache (the MIS aux state is "
                "not pool-permutation aware)"
            )
        P0 = state[5].shape[0]
        D = settings.trace_depth
        counts = []
        if plan.nee_bounce_kernel:
            # Per-bounce fused NEE kernel (big bodies, VERDICT r2 #9):
            # the MIS aux rides as two f32 pool lanes between kernels.
            from .ops.megakernel import bounce_step_pallas_nee

            aw = _lights_area_weight(scene)
            aux = (
                jnp.zeros((P0,), jnp.float32),
                jnp.zeros((P0,), jnp.float32),
            )

            def nee_step(st, ax, depth, last):
                return bounce_step_pallas_nee(
                    st, ax, scene, aw, iteration,
                    jnp.asarray(depth, jnp.int32), settings, last,
                )

            if D == 1:
                state, aux = nee_step(state, aux, 0, True)
                counts.append(jnp.sum(state[4]))
            else:
                state, aux = nee_step(state, aux, 0, False)
                counts.append(jnp.sum(state[4]))

                def nee_bounce_k(carry, depth):
                    st, ax = carry
                    st, ax = nee_step(st, ax, depth, False)
                    return (st, ax), jnp.sum(st[4])

                if D > 2:
                    (state, aux), mid_counts = jax.lax.scan(
                        nee_bounce_k,
                        (state, aux),
                        jnp.arange(1, D - 1, dtype=jnp.int32),
                    )
                    counts.append(mid_counts)
                state, aux = nee_step(state, aux, D - 1, True)
                counts.append(jnp.sum(state[4]))
        else:
            aux = (jnp.zeros((P0,), jnp.float32), jnp.zeros((P0,), bool))
            if D == 1:
                state, aux = _nee_mis_bounce(
                    state, aux, scene, iteration, 0, settings, is_last=True
                )
                counts.append(jnp.sum(state[4]))
            else:
                state, aux = _nee_mis_bounce(
                    state, aux, scene, iteration, 0, settings, is_last=False
                )
                counts.append(jnp.sum(state[4]))

                def nee_bounce(carry, depth):
                    st, ax = carry
                    st, ax = _nee_mis_bounce(
                        st, ax, scene, iteration, depth, settings,
                        is_last=False,
                    )
                    return (st, ax), jnp.sum(st[4])

                if D > 2:
                    (state, aux), mid_counts = jax.lax.scan(
                        nee_bounce,
                        (state, aux),
                        jnp.arange(1, D - 1, dtype=jnp.int32),
                    )
                    counts.append(mid_counts)
                state, aux = _nee_mis_bounce(
                    state, aux, scene, iteration, D - 1, settings,
                    is_last=True,
                )
                counts.append(jnp.sum(state[4]))
        alive_counts = jnp.concatenate(
            [c if c.ndim else c[None] for c in counts]
        )
        radiance_out, pix_out = state[3], state[5]
        if pad:
            sl = lambda a: a[:n_pixels]
            radiance_out = Vec3(
                sl(radiance_out.x), sl(radiance_out.y), sl(radiance_out.z)
            )
            pix_out = pix_out[:n_pixels]
        return radiance_out, pix_out, _empty_cache(P0), alive_counts

    def one_bounce(state, depth, isect=None):
        if use_pipe and isect is None:
            from .ops.pipeline import bounce_step_pipeline

            return bounce_step_pipeline(
                state, scene, iteration, depth, settings
            )
        if use_mk and isect is None:
            from .ops.megakernel import bounce_step_pallas

            # with compaction the pool is alive-first: pass the traced
            # alive count so whole dead tiles skip the bounce compute
            num_alive = jnp.sum(state[4]) if settings.compact else None
            return bounce_step_pallas(
                state, scene, iteration, depth, settings, num_alive=num_alive
            )
        if isect is None:
            isect = intersect_scene_any(
                state[0], state[1], scene, settings, alive=state[4]
            )
        state, isect = _maybe_sort_by_material(state, isect, settings)
        if plan.shard_shade:
            # tri-sharded fused shade: the merged Intersections feed the
            # standalone Pallas shade kernel (bit-identical shading to
            # the sequential pipeline's K3 — same _shade_values body)
            from .ops.megakernel import shade_step_pallas

            return shade_step_pallas(
                state, isect, scene, iteration, depth, settings
            )
        return _shade_step(state, isect, scene, iteration, depth, settings)

    # --- depth 0 (unrolled so the first-bounce cache can splice in;
    # when caching is active the XLA intersect path is used at depth 0
    # so the cached Intersections pytree exists in pool order) ---
    if not fused_first:
        if settings.effective_cache():
            isect0 = (
                cache
                if use_cache
                else intersect_scene_any(
                    state[0], state[1], scene, settings, alive=state[4]
                )
            )
            cache_out = isect0
            state, isect0s = _maybe_sort_by_material(state, isect0, settings)
            if plan.shard_shade:
                from .ops.megakernel import shade_step_pallas

                state = shade_step_pallas(
                    state, isect0s, scene, iteration, 0, settings
                )
            else:
                state = _shade_step(
                    state, isect0s, scene, iteration, 0, settings
                )
        else:
            cache_out = _empty_cache(state[5].shape[0])
            state = one_bounce(state, 0)
    state = _maybe_compact(state, settings)
    count0 = jnp.sum(state[4])

    # --- depths 1..D-1 under lax.scan (the wavefront bounce loop,
    # src/pathtrace.cu:340-377); unrolled so XLA/Mosaic can overlap
    # adjacent bounces instead of round-tripping a 14-array scan carry ---
    def bounce(state, depth):
        state = one_bounce(state, depth)
        state = _maybe_compact(state, settings)
        return state, jnp.sum(state[4])

    # With direct lighting the FINAL depth runs outside the scan (it
    # needs the hit point for the shadow ray — _nee_final_step).
    last_scan_depth = settings.trace_depth - (
        1 if settings.direct_lighting else 0
    )
    if last_scan_depth > 1:
        depths = jnp.arange(1, last_scan_depth, dtype=jnp.int32)
        # Unrolling lets XLA fuse across bounce boundaries instead of
        # round-tripping a 14-array scan carry (~20% at 800x800). The
        # Pallas path keeps the rolled scan: its bounce is ONE kernel
        # whose Mosaic compilation would otherwise repeat per unrolled
        # step (70+ kernel compiles per batched program).
        state, more_counts = jax.lax.scan(
            bounce, state, depths, unroll=not (use_mk or use_pipe)
        )
        alive_counts = jnp.concatenate([count0[None], more_counts])
    else:
        alive_counts = count0[None]

    if settings.direct_lighting and settings.trace_depth > 1:
        state = _nee_final_step(state, scene, iteration, settings)
        alive_counts = jnp.concatenate(
            [alive_counts, jnp.sum(state[4])[None]]
        )

    radiance, pix_out = state[3], state[5]
    if pad and not settings.compact:
        # No permutation happened: pad lanes are still the tail. (With
        # compaction the pool is permuted; the scatter path handles the
        # pad lanes instead — their radiance is identically 0.)
        sl = lambda a: a[:P]
        radiance = Vec3(sl(radiance.x), sl(radiance.y), sl(radiance.z))
        pix_out = pix_out[:P]

    return radiance, pix_out, cache_out, alive_counts


def _scatter_add(accum: Vec3, pix: jnp.ndarray, radiance: Vec3) -> Vec3:
    return Vec3(
        accum.x.at[pix].add(radiance.x, unique_indices=True),
        accum.y.at[pix].add(radiance.y, unique_indices=True),
        accum.z.at[pix].add(radiance.z, unique_indices=True),
    )


@functools.partial(
    jax.jit,
    static_argnames=("settings", "use_cache"),
    donate_argnames=("accum",),
)
def render_iteration(
    scene: DeviceScene,
    cam: DeviceCamera,
    accum: Vec3,  # (P,) lanes running radiance accumulator
    iteration: jnp.ndarray,  # scalar int32, 1-based like the reference
    cache: Intersections,  # first-bounce cache (zeros when unused)
    settings: RenderSettings,
    use_cache: bool,
):
    """One full sample per pixel: the body of pathtrace()
    (src/pathtrace.cu:284-393) as a single compiled program.

    Returns (accum', depth0_intersections, alive_counts (D,))."""
    radiance, pix, cache_out, alive_counts = trace_paths(
        scene, cam, iteration, cache, settings, use_cache
    )

    # --- finalGather (src/pathtrace.cu:269-278) ---
    if settings.sort_by_material or settings.compact:
        accum = _scatter_add(accum, pix, radiance)
    else:
        accum = accum + radiance  # pool slot == pixel: pure vector add

    return accum, cache_out, alive_counts


@functools.partial(
    jax.jit,
    static_argnames=("settings", "n_iters"),
    donate_argnames=("accum",),
)
def render_batch(
    scene: DeviceScene,
    cam: DeviceCamera,
    accum: Vec3,
    iteration0: jnp.ndarray,  # first 1-based iteration id in this batch
    n_iters: int,
    settings: RenderSettings,
):
    """n_iters full samples in ONE compiled program (lax.fori_loop over
    render iterations) — one dispatch per batch, accumulator resident in
    HBM (vs the reference's per-iteration launch + D2H copy,
    src/pathtrace.cu:389-390).

    When the first-bounce cache is enabled, the depth-0 intersections are
    computed ONCE before the loop and reused by every iteration in the
    batch (the cache contract of INSTRUCTION.md:87-89, hoisted).

    The plain Pallas path (no cache/sort/compact/NEE) uses the
    whole-iteration kernel: raygen + every bounce in ONE kernel with the
    path state resident in VMEM across bounces.

    Kernel-tier eligibility comes from kernel_plan (single source of
    truth). The whole-iteration kernel wins when its (geoms x
    materials) unrolled body stays small (plan.small_body): Cornell
    (7x5) runs 2256 vs 1738 Mrays/s per-bounce, but many_materials
    1080p (38 geoms x 32 materials) collapses to 133 vs 483 — measured
    crossover in docs/ANALYSIS.md; big scenes take the per-bounce
    megakernel sequence instead."""
    plan = kernel_plan(scene, settings)
    if plan.whole_kernel:
        from .ops.megakernel import full_iteration_pallas, pack_camera

        P = accum.x.shape[0]
        pad = (-P) % (8 * 128)
        cam_vec = pack_camera(cam)

        def body(k, accum):
            radiance = full_iteration_pallas(
                scene,
                cam_vec,
                (iteration0 + k).astype(jnp.int32),
                settings,
                cam.resolution,
                pad,
            )
            return accum + radiance

        return jax.lax.fori_loop(0, n_iters, body, accum)

    # Fused NEE+MIS kernel: the whole estimator (light sampling, shadow
    # rays, MIS bookkeeping) in one Pallas program per iteration.
    if plan.nee_kernel:
        from .ops.megakernel import full_iteration_nee_pallas, pack_camera

        P = accum.x.shape[0]
        pad = (-P) % (8 * 128)
        cam_vec = pack_camera(cam)
        aw = _lights_area_weight(scene)

        def nee_body(k, accum):
            radiance = full_iteration_nee_pallas(
                scene,
                cam_vec,
                aw,
                (iteration0 + k).astype(jnp.int32),
                settings,
                cam.resolution,
                pad,
            )
            return accum + radiance

        return jax.lax.fori_loop(0, n_iters, nee_body, accum)

    use_cache = settings.effective_cache()
    if use_cache:
        origins, dirs, _ = generate_rays(cam, iteration0, False, False)
        cache = intersect_scene_any(origins, dirs, scene, settings)
    else:
        cache = _empty_cache(accum.x.shape[0])

    def body(k, accum):
        radiance, pix, _, _ = trace_paths(
            scene,
            cam,
            (iteration0 + k).astype(jnp.int32),
            cache,
            settings,
            use_cache,
        )
        if settings.sort_by_material or settings.compact:
            return _scatter_add(accum, pix, radiance)
        return accum + radiance

    return jax.lax.fori_loop(0, n_iters, body, accum)


@functools.partial(jax.jit, static_argnames=("resolution",))
def tonemap(accum: Vec3, iteration: jnp.ndarray, resolution):
    """Running-average -> uint8 frame; sendImageToPBO semantics
    (src/pathtrace.cu:48-68): trunc(pix/iter*255) clamped to [0,255].
    The (H,W,3) interleave happens once here, at the display boundary."""
    resx, resy = resolution
    scale = 255.0 / jnp.maximum(iteration.astype(jnp.float32), 1.0)

    def chan(c):
        return jnp.clip((c * scale).astype(jnp.int32), 0, 255).astype(jnp.uint8)

    img = jnp.stack([chan(accum.x), chan(accum.y), chan(accum.z)], axis=-1)
    return img.reshape(resy, resx, 3)


def _empty_cache(pixel_count: int) -> Intersections:
    return Intersections(
        t=jnp.zeros((pixel_count,), jnp.float32),
        normal=Vec3.zeros((pixel_count,)),
        material_id=jnp.zeros((pixel_count,), jnp.int32),
        outside=jnp.zeros((pixel_count,), bool),
    )


class Renderer:
    """Progressive render driver: owns the accumulator, iteration count,
    camera state and first-bounce cache.

    Replaces the runCuda() driver + pathtraceInit/Free device-state
    lifecycle (src/main.cpp:101-147, src/pathtrace.cu:79-112). Camera
    changes reset iteration to 0 and clear the accumulator+cache
    (reset-on-camera-change contract, src/main.cpp:102-128).
    """

    def __init__(self, scene: Scene, settings: RenderSettings | None = None):
        self.scene = scene
        self.settings = settings or RenderSettings(
            trace_depth=scene.state.trace_depth or 8
        )
        if self.settings.trace_depth <= 0:
            self.settings = replace(self.settings, trace_depth=8)
        self.dev_scene = scene_to_device(scene, use_bvh=self.settings.use_bvh)
        guard_tpu_mesh_path(
            self.dev_scene, self.settings, scene.state.camera.pixel_count
        )
        self.camera = scene.state.camera
        self.dev_camera = camera_to_device(self.camera)
        self.start_time_string = image_io.current_time_string()
        self._reset_buffers()

    # -- state management -------------------------------------------------
    def _reset_buffers(self):
        P = self.camera.pixel_count
        self.accum = Vec3.zeros((P,))
        self.cache = _empty_cache(P)
        self.cache_valid = False
        self.iteration = 0
        self.last_alive_counts = None

    def set_camera(self, camera):
        """Any camera change resets progressive state (src/main.cpp:102-128)."""
        self.camera = camera
        self.dev_camera = camera_to_device(camera)
        self._reset_buffers()

    def orbit_camera(self, dphi=0.0, dtheta=0.0, dzoom=0.0, look_at=None):
        """Spherical-coordinate orbit controls (src/main.cpp:149-205):
        derive phi/theta/zoom from the current camera, apply deltas,
        rebuild the basis exactly like runCuda (src/main.cpp:102-120)."""
        cam = self.camera
        la = np.asarray(look_at if look_at is not None else cam.look_at, np.float32)
        offset = cam.position - la
        zoom = float(np.linalg.norm(offset))
        view = (la - cam.position) / max(zoom, 1e-9)
        view_xz = np.array([view[0], 0.0, view[2]])
        view_zy = np.array([0.0, view[1], view[2]])
        nxz = np.linalg.norm(view_xz)
        nzy = np.linalg.norm(view_zy)
        phi = float(np.arccos(np.clip(np.dot(view_xz / max(nxz, 1e-9), [0, 0, -1]), -1, 1)))
        if view[0] > 0:
            phi = -phi
        theta = float(np.arccos(np.clip(np.dot(view_zy / max(nzy, 1e-9), [0, 1, 0]), -1, 1)))

        phi += dphi
        theta = float(np.clip(theta + dtheta, 0.001, np.pi - 0.001))
        zoom = max(0.1, zoom + dzoom)

        pos = zoom * np.array(
            [np.sin(phi) * np.sin(theta), np.cos(theta), np.cos(phi) * np.sin(theta)],
            np.float32,
        )
        new_cam = derive_camera(
            cam.resolution,
            pos + la,
            la,
            np.array([0, 1, 0], np.float32),
            float(cam.fov[1]),
            cam.aperture,
            cam.focal_distance,
        )
        self.set_camera(new_cam)

    def pan_camera(self, dx: float = 0.0, dy: float = 0.0):
        """Pan the look-at point in the ground plane (the reference's
        MMB drag, src/main.cpp:191-202): lookAt moves along the
        y-flattened right/forward axes; position is rebuilt around the
        new lookAt with phi/theta/zoom UNCHANGED (src/main.cpp:108-115:
        position = zoom*spherical + lookAt) — i.e. the camera translates
        with its target."""
        cam = self.camera
        fwd = np.array([cam.view[0], 0.0, cam.view[2]], np.float32)
        rgt = np.array([cam.right[0], 0.0, cam.right[2]], np.float32)
        fwd /= max(float(np.linalg.norm(fwd)), 1e-9)
        rgt /= max(float(np.linalg.norm(rgt)), 1e-9)
        delta = (-dx * rgt + dy * fwd).astype(np.float32)
        new_cam = derive_camera(
            cam.resolution,
            cam.position + delta,
            cam.look_at + delta,
            np.array([0, 1, 0], np.float32),
            float(cam.fov[1]),
            cam.aperture,
            cam.focal_distance,
        )
        self.set_camera(new_cam)

    # -- rendering ---------------------------------------------------------
    def step(self) -> int:
        """Render one sample per pixel (one `pathtrace()` call)."""
        self.iteration += 1
        # Only trust the cache once a step has actually filled it: after
        # load_checkpoint (or a reset) the cache is zeros, and treating
        # zeros as "all rays missed" silently zeroes every sample.
        use_cache = self.settings.effective_cache() and self.cache_valid
        self.accum, cache_out, alive = render_iteration(
            self.dev_scene,
            self.dev_camera,
            self.accum,
            jnp.int32(self.iteration),
            self.cache,
            settings=self.settings,
            use_cache=use_cache,
        )
        if self.settings.effective_cache() and not self.cache_valid:
            self.cache = cache_out
            self.cache_valid = True
        self.last_alive_counts = alive
        return self.iteration

    def step_batch(self, n: int) -> int:
        """Render n samples in one compiled call (see render_batch)."""
        if n <= 0:
            return self.iteration
        self.accum = render_batch(
            self.dev_scene,
            self.dev_camera,
            self.accum,
            jnp.int32(self.iteration + 1),
            n_iters=n,
            settings=self.settings,
        )
        self.iteration += n
        return self.iteration

    def run(self, iterations: int | None = None, progress_every: int = 0):
        target = iterations if iterations is not None else self.scene.state.iterations
        while self.iteration < target:
            self.step()
            if progress_every and self.iteration % progress_every == 0:
                jax.block_until_ready(self.accum)
                yield self.iteration
        jax.block_until_ready(self.accum)

    def render(self, iterations: int | None = None) -> np.ndarray:
        for _ in self.run(iterations):
            pass
        return self.image()

    # -- output -------------------------------------------------------------
    def image(self) -> np.ndarray:
        """(H,W,3) float radiance accumulator on host."""
        resx, resy = self.camera.resolution
        chans = [np.asarray(c).reshape(resy, resx) for c in self.accum]
        return np.stack(chans, axis=-1)

    def frame_uint8(self) -> np.ndarray:
        """Tonemapped preview frame (H,W,3) uint8."""
        return np.asarray(
            tonemap(self.accum, jnp.int32(self.iteration), self.camera.resolution)
        )

    def save(self, out_dir: str = ".", hdr: bool = False) -> str:
        return image_io.save_render(
            self.image(),
            self.iteration,
            self.scene.state.image_name,
            self.start_time_string,
            hdr=hdr,
            out_dir=out_dir,
        )

    # -- checkpoint/resume (additive feature, SURVEY.md §5) -----------------
    def save_checkpoint(self, path: str) -> str:
        np.savez_compressed(
            path,
            accum=self.image(),
            iteration=self.iteration,
            resolution=np.array(self.camera.resolution),
        )
        return path

    def load_checkpoint(self, path: str):
        data = np.load(path)
        if tuple(data["resolution"]) != tuple(self.camera.resolution):
            raise ValueError("checkpoint resolution mismatch")
        img = data["accum"]
        self.accum = Vec3(
            jnp.asarray(img[..., 0].reshape(-1)),
            jnp.asarray(img[..., 1].reshape(-1)),
            jnp.asarray(img[..., 2].reshape(-1)),
        )
        self.iteration = int(data["iteration"])
        # The checkpoint stores no depth-0 intersections; the next step()
        # recomputes and re-validates the cache.
        self.cache = _empty_cache(self.camera.pixel_count)
        self.cache_valid = False
