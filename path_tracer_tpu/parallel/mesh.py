"""Multi-chip scaling: framebuffer-tile and spp sharding over a device mesh.

The reference is single-process (rayon threads over pixels, SURVEY.md §2);
its one parallel axis — independent Monte Carlo pixels/samples — maps onto a
TPU pod as data parallelism over a 1-D ``jax.sharding.Mesh``:

* **tile sharding**: each chip traces a contiguous slab of film lanes
  (BASELINE config 5: 1080p@1024spp tiled across v5e-8). Scene arrays are
  replicated (BVH + triangles are tens of MB), film output stays sharded and
  is gathered only for snapshots.
* **spp sharding**: each chip traces the full film at a different sample id;
  accumulators are summed with one ``psum`` over ICI per round.

Because every RNG draw keys on the absolute film lane and sample id
(`integrator.wavefront.trace_lanes`), both shardings reproduce the
single-chip render exactly up to float reassociation (~1 ulp — XLA may fuse
the per-shard program differently than the full-film program).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from path_tracer_tpu.integrator.wavefront import trace_lanes

shard_map = jax.shard_map


def make_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def render_sample_sharded(
    scene: dict,
    ndc_to_world,
    cam_origin,
    sample_id,
    width: int,
    height: int,
    mesh: Mesh,
    max_bounces: int = 64,
    enable_nee: bool = True,
    has_lights: bool = True,
    spp: int = 1,
    mtypes=None,
    any_volumes: bool = True,
    aperture: float = 0.0,
    focus: float = 0.0,
    cam_basis=None,
):
    """``spp`` samples/pixel with film lanes sharded across ``mesh``.

    Returns radiance ``[N, 3]`` still sharded over devices (lane-major).
    ``width*height`` must divide evenly by the mesh size.
    """
    n = width * height
    n_dev = mesh.devices.size
    if n % n_dev:
        raise ValueError(f"film lanes {n} not divisible by {n_dev} devices")
    chunk = n // n_dev
    axis = mesh.axis_names[0]

    from path_tracer_tpu.integrator import bsdf as bsdf_mod

    kinds = tuple(mtypes) if mtypes is not None else bsdf_mod.ALL_MTYPES

    def shard_fn(scene_rep, ndc, org):
        dev = jax.lax.axis_index(axis)
        lane = dev * chunk + jnp.arange(chunk, dtype=jnp.uint32)
        rad, _, _, rays = trace_lanes(
            scene_rep, ndc, org, sample_id, lane, width, height,
            max_bounces=max_bounces, enable_nee=enable_nee, has_lights=has_lights,
            spp=spp, mtypes=kinds, any_volumes=any_volumes,
            aperture=aperture, focus=focus, cam_basis=cam_basis,
        )
        return rad, rays

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(axis), P(axis)),
        # while_loop carries in the traversal kernels start from replicated
        # constants; skip the varying-manual-axes type check.
        check_vma=False,
    )
    return fn(scene, jnp.asarray(ndc_to_world), jnp.asarray(cam_origin))


def render_spp_sharded(
    scene: dict,
    ndc_to_world,
    cam_origin,
    base_sample: int,
    width: int,
    height: int,
    mesh: Mesh,
    max_bounces: int = 64,
    enable_nee: bool = True,
    has_lights: bool = True,
    spp: int = 1,
    mtypes=None,
    any_volumes: bool = True,
    aperture: float = 0.0,
    focus: float = 0.0,
    cam_basis=None,
):
    """Each device traces the whole film at ``spp`` samples starting from
    ``base_sample + device_index * spp``; the radiance sums are reduced with
    one ``psum`` over ICI. Returns a replicated ``[N, 4]`` accumulator delta
    (rgb sum + count). Carries the same static scene specialization knobs
    (``mtypes``, ``any_volumes``) as the tile path so real multi-chip renders
    compile the specialized program, not the generic one."""
    axis = mesh.axis_names[0]
    n = width * height

    from path_tracer_tpu.integrator import bsdf as bsdf_mod

    kinds = tuple(mtypes) if mtypes is not None else bsdf_mod.ALL_MTYPES

    def shard_fn(scene_rep, ndc, org):
        dev = jax.lax.axis_index(axis)
        lane = jnp.arange(n, dtype=jnp.uint32)
        rad, _, _, _ = trace_lanes(
            scene_rep, ndc, org,
            jnp.uint32(base_sample) + dev.astype(jnp.uint32) * jnp.uint32(spp),
            lane, width, height,
            max_bounces=max_bounces, enable_nee=enable_nee, has_lights=has_lights,
            spp=spp, mtypes=kinds, any_volumes=any_volumes,
            aperture=aperture, focus=focus, cam_basis=cam_basis,
        )
        acc = jnp.concatenate([rad, jnp.full((n, 1), spp, jnp.float32)], axis=1)
        return jax.lax.psum(acc, axis)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(scene, jnp.asarray(ndc_to_world), jnp.asarray(cam_origin))


def render_sharded(
    scene_host,
    camera,
    width: int,
    height: int,
    spp: int,
    mesh: Mesh | None = None,
    max_bounces: int = 64,
    enable_nee: bool = True,
):
    """Multi-device progressive render (tile-sharded). Returns film [H,W,4]."""
    if mesh is None:
        mesh = make_mesh()
    scene = scene_host.device() if hasattr(scene_host, "device") else scene_host
    has_lights = "light" in scene
    ndc = jnp.asarray(camera.view_proj_inverse())
    org = jnp.asarray(camera.origin)

    film = jnp.zeros((height * width, 4), jnp.float32)
    for s in range(spp):
        rad, _ = render_sample_sharded(
            scene, ndc, org, s, width, height, mesh,
            max_bounces=max_bounces, enable_nee=enable_nee, has_lights=has_lights,
        )
        film = film + jnp.concatenate([rad, jnp.ones((rad.shape[0], 1), jnp.float32)], axis=1)
    return film.reshape(height, width, 4)


# jitted segment/compact/scatter programs for the sharded interactive frame,
# memoized per (mesh, static config) — rebuilding them per frame would
# discard the jit cache and retrace every frame.
_frame_fns_cache: dict = {}


def _frame_fns(mesh: Mesh, cfg: tuple):
    key = (mesh, cfg)
    fns = _frame_fns_cache.get(key)
    if fns is not None:
        return fns
    (width, height, chunk, max_bounces, enable_nee, has_lights, kinds,
     any_volumes, aperture, focus, has_basis) = cfg
    axis = mesh.axis_names[0]
    common = dict(width=width, height=height, max_bounces=max_bounces,
                  enable_nee=enable_nee, has_lights=has_lights, spp=1,
                  mtypes=kinds, any_volumes=any_volumes, aperture=aperture,
                  focus=focus, return_state=True)

    @partial(jax.jit, static_argnames=("steps",))
    def seg0(scene_rep, ndc, org, sid, basis, steps):
        def f(scene_rep, ndc, org, sid, basis):
            dev = jax.lax.axis_index(axis)
            lane = (dev.astype(jnp.uint32) * jnp.uint32(chunk)
                    + jnp.arange(chunk, dtype=jnp.uint32))
            s = trace_lanes(scene_rep, ndc, org, sid, lane,
                            max_steps=steps, cam_basis=basis, **common)
            cnt = jnp.count_nonzero(s["alive"]).reshape(1)
            return s, lane, cnt
        return shard_map(f, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
                         out_specs=(P(axis), P(axis), P(axis)),
                         check_vma=False)(scene_rep, ndc, org, sid, basis)

    @partial(jax.jit, static_argnames=("steps",))
    def seg(scene_rep, ndc, org, sid, basis, s, lane, steps):
        def f(scene_rep, ndc, org, sid, basis, s, lane):
            s2 = trace_lanes(scene_rep, ndc, org, sid, lane,
                             init_state=s, max_steps=steps,
                             cam_basis=basis, **common)
            cnt = jnp.count_nonzero(s2["alive"]).reshape(1)
            return s2, cnt
        return shard_map(f, mesh=mesh,
                         in_specs=(P(), P(), P(), P(), P(), P(axis), P(axis)),
                         out_specs=(P(axis), P(axis)),
                         check_vma=False)(scene_rep, ndc, org, sid, basis,
                                          s, lane)

    @partial(jax.jit, static_argnames=("cap",))
    def compact(s, lane, cap):
        def f(s, lane):
            order = jnp.argsort(jnp.logical_not(s["alive"]), stable=True)[:cap]
            return (jax.tree_util.tree_map(lambda a: a[order], s),
                    lane[order])
        return shard_map(f, mesh=mesh, in_specs=(P(axis), P(axis)),
                         out_specs=(P(axis), P(axis)),
                         check_vma=False)(s, lane)

    @jax.jit
    def scatter(rad, rays2, s, lane):
        def f(rad, rays2, s, lane):
            dev = jax.lax.axis_index(axis)
            idx = lane.astype(jnp.int32) - dev.astype(jnp.int32) * chunk
            return (rad.at[idx].set(s["accum"]),
                    rays2.at[idx].set(
                        jnp.stack([s["rays"], s["rays_strict"]], axis=1)))
        return shard_map(f, mesh=mesh,
                         in_specs=(P(axis), P(axis), P(axis), P(axis)),
                         out_specs=(P(axis), P(axis)),
                         check_vma=False)(rad, rays2, s, lane)

    fns = (seg0, seg, compact, scatter)
    _frame_fns_cache[key] = fns
    return fns


def frame_segmented_sharded(
    scene: dict,
    ndc_to_world,
    cam_origin,
    sample_id,
    width: int,
    height: int,
    mesh: Mesh,
    max_bounces: int = 64,
    enable_nee: bool = True,
    has_lights: bool = True,
    mtypes=None,
    any_volumes: bool = True,
    aperture: float = 0.0,
    focus: float = 0.0,
    cam_basis=None,
    predictor=None,
):
    """One interactive frame (1 spp pinned) with dead-lane segmented
    compaction, tile-sharded across ``mesh`` — the multi-chip form of
    ``wavefront.render_sample_segmented`` (the r4/r5 fps path).

    Each device owns a contiguous slab of ``width*height / n_devices`` film
    lanes and compacts its OWN survivors between segments; the host reads
    the per-shard alive counts (one tiny all-device sync per segment) and
    picks ONE static buffer size from the per-shard menu — the max shard
    count decides, so no live lane is ever dropped. Per-lane math is
    identical to the single-device path (RNG keys on absolute lane ids);
    output matches ``render_sample_segmented`` up to the documented
    per-shard-program float reassociation (~1 ulp).

    Returns ``(radiance [N,3], position [N,4], first_id [N], rays [N,2])``
    as lane-major sharded arrays. The reference's interactive loop is
    single-machine (main.rs:141-224); this is the TPU answer for driving
    the same 1 spp/frame progressive+TAA pipeline from a pod slice.
    """
    from path_tracer_tpu.integrator import bsdf as bsdf_mod
    from path_tracer_tpu.integrator import wavefront as wf

    n = width * height
    n_dev = mesh.devices.size
    if n % n_dev:
        raise ValueError(f"film lanes {n} not divisible by {n_dev} devices")
    chunk = n // n_dev
    kinds = tuple(mtypes) if mtypes is not None else bsdf_mod.ALL_MTYPES
    cfg = (width, height, chunk, max_bounces, enable_nee, has_lights, kinds,
           any_volumes, aperture, focus, cam_basis is not None)
    seg0, seg, compact, scatter = _frame_fns(mesh, cfg)

    sid = jnp.uint32(sample_id)
    ndc = jnp.asarray(ndc_to_world)
    org = jnp.asarray(cam_origin)
    s, lane, cnt = seg0(scene, ndc, org, sid, cam_basis, wf._SEG_B0)
    position, first_id = s["position"], s["first_id"]
    rad = s["accum"]
    rays2 = jnp.stack([s["rays"], s["rays_strict"]], axis=1)

    caps = wf._seg_caps(chunk)

    def exact_loop(s, lane, cnt, rad, rays2):
        """Count-driven schedule: one host max-count read per segment (a
        full all-device sync each). Returns outputs + the observed max
        boundary counts — the seed for the predicted schedule."""
        counts = []
        cur = chunk
        while True:
            m = int(jnp.max(cnt))
            counts.append(m)
            if m == 0:
                break
            cap = cur
            for c in caps:
                if m <= c < cap:
                    cap = c
            if cap < cur:
                s, lane = compact(s, lane, cap)
                cur = cap
            steps = wf._seg_steps_for(cur, chunk)
            s, cnt = seg(scene, ndc, org, sid, cam_basis, s, lane, steps)
            rad, rays2 = scatter(rad, rays2, s, lane)
        return rad, rays2, counts

    use_predict = predictor is not None and wf._SEG_PREDICT
    pkey = ("sharded", cfg, n_dev, tuple(caps), wf._SEG_B0, wf._SEG_STEPS,
            wf._SEG_BIG_STEPS, wf._SEG_TAIL_AT, wf._SEG_TAIL_STEPS)
    plan = None
    if use_predict and predictor.key == pkey:
        plan = predictor.plan
    if plan:
        # Predicted schedule (wavefront.render_sample_segmented's temporal
        # plan, in sharded form): every dispatch chains asynchronously; the
        # shared buffer size per boundary is planned from last frame's
        # max-over-shards counts, validated by ONE end-of-frame status
        # fetch. Overflow or surviving lanes => exact re-render, so no live
        # lane on any shard can be dropped.
        s0, lane0, cnt0 = s, lane, cnt
        maxes = []
        cur = chunk
        ps, plane_, pcnt = s, lane, cnt
        prad, prays2 = rad, rays2
        for cap, steps in plan:
            maxes.append(jnp.max(pcnt).astype(jnp.int32))
            cap = min(cap, cur)
            if cap < cur:
                ps, plane_ = compact(ps, plane_, cap)
                cur = cap
            ps, pcnt = seg(scene, ndc, org, sid, cam_basis, ps, plane_,
                           steps)
            prad, prays2 = scatter(prad, prays2, ps, plane_)
        status = wf._seg_status(
            jnp.stack(maxes) if maxes else jnp.zeros((0,), jnp.int32),
            jnp.max(pcnt).astype(jnp.int32),
            tuple(min(c, chunk) for c, _ in plan))
        st = np.asarray(status)
        if int(st[-1]) == 0:
            rad, rays2 = prad, prays2
            predictor.plan = wf._plan_from_counts(
                [int(c) for c in st[:-2]], chunk, caps)
        else:
            predictor.overflows += 1
            rad, rays2, counts = exact_loop(s0, lane0, cnt0, rad, rays2)
            predictor.plan = wf._plan_from_counts(counts, chunk, caps)
    else:
        rad, rays2, counts = exact_loop(s, lane, cnt, rad, rays2)
        if use_predict:
            predictor.plan = wf._plan_from_counts(counts, chunk, caps)
            predictor.key = pkey
    return rad, position, first_id, rays2
