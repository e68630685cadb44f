"""Sharded multi-chip depth pipeline: data-parallel frames x event-parallel
events, composed with shard_map and XLA collectives over ICI.

Design notes (TPU-first):

- Frames are independent; the ``data`` mesh axis shards a leading batch
  axis of stacked EventBatches.  No collectives cross this axis.
- Within a frame, the ``event`` axis shards the padded event dimension.
  Two collectives are needed per frame: pmin/pmax of the frame time window
  (two scalars) and a pmax all-reduce of the index-packed disparity map
  (int32 image).  Packing global event indices keeps NumPy's
  last-write-wins scatter semantics bit-exact regardless of sharding
  (see ops.scatter).
- The dense image tail runs replicated on the event axis; its cost is a
  few megapixel-ops and the alternative (spatially sharding dilate+remap)
  needs halo exchanges -- measured to not pay off at these image sizes.

When does the event axis pay?  (cost model; VERDICT r4 item 8)

  saved   = (1 - 1/E) * (T_event_kernel + T_scatter)
          ~= (1 - 1/E) * N_events * 6.6 ns        (measured v5e floors)
  added   = ring all-reduce of the packed map over ICI
          = 2 * (E-1)/E * 4 * H_map * W_map / BW_ici,  BW_ici ~45 GB/s/dir

  -> event sharding pays iff  N_events  >~  0.027 * H_map * W_map.

At the paper's regimes it does NOT pay: the ESL eval geometry reduces a
6.6 Mpx packed map (break-even ~178k events/frame vs the actual ~28k;
the all-reduce alone would cost ~1.2 ms against <190 us of saved
compute).  It pays only for high event rates into SMALL maps -- e.g. the
camera view's 0.3 Mpx map breaks even near ~8k events/frame.  The
default mesh is therefore data-only (``make_mesh(event=1)``); pass
``event > 1`` deliberately, for regimes on the paying side of the model.
(The 8-virtual-CPU-device weak-scaling numbers in SCALING_r04.json say
nothing about real ICI -- virtual devices serialize; this model is the
v5e answer.)
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xmaps_tpu.config import PipelineConfig
from xmaps_tpu.ops.disparity import compute_event_disparity, time_bounds
from xmaps_tpu.ops.event_batch import EventBatch
from xmaps_tpu.ops.frame_pipeline import DeviceTables, FrameResult
from xmaps_tpu.ops.image_tail import (
    clip_normalize_u8,
    colorize_turbo,
    dilate_max,
    disparity_to_depth,
    remap_nearest_i16,
)
from xmaps_tpu.ops.scatter import scatter_disp_packed, unpack_disp

__all__ = [
    "make_mesh",
    "make_sharded_pipeline",
    "make_group_sharded_pipeline",
    "shard_batches",
    "shard_staged_group",
]


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    data: int | None = None,
    event: int = 1,
) -> Mesh:
    """Create a ('data', 'event') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // event
    assert data * event == n, f"{data}x{event} != {n} devices"
    dev_array = np.array(devices).reshape(data, event)
    return Mesh(dev_array, axis_names=("data", "event"))


def _frame_event_sharded(
    batch: EventBatch,
    tables: DeviceTables,
    cfg: PipelineConfig,
    *,
    axis_name: str = "event",
    local_capacity: int,
) -> FrameResult:
    """Per-frame pipeline over a local event shard (inside shard_map)."""
    shard = jax.lax.axis_index(axis_name)

    priority = None
    if cfg.frame_filter != "none":
        # Dedup filters need global per-key winners and globally consistent
        # scatter ranks, so gather the whole frame over the event axis
        # (one all_gather per field), filter it replicated, and slice this
        # shard's lanes back out.  Filters are off the hot path; the
        # all_gather cost is accepted for bit-identity with single-chip.
        from xmaps_tpu.ops.disparity import rectify_events_packed
        from xmaps_tpu.ops.filters import apply_frame_filter

        gather = functools.partial(
            jax.lax.all_gather, axis_name=axis_name, tiled=True
        )
        full = EventBatch(
            x=gather(batch.x),
            y=gather(batch.y),
            t=gather(batch.t),
            p=gather(batch.p),
            valid=gather(batch.valid),
            count=batch.count,
        )
        xr_full, _ = rectify_events_packed(
            full.x, full.y, tables.cam_map_packed
        )
        fb = apply_frame_filter(
            full,
            xr_full,
            name=cfg.frame_filter,
            camera_width=cfg.camera_width,
            camera_height=cfg.camera_height,
            rect_width=cfg.rect_width,
        )
        start = shard * local_capacity
        slc = lambda a: jax.lax.dynamic_slice_in_dim(a, start, local_capacity)
        batch = EventBatch(
            x=slc(fb.batch.x),
            y=slc(fb.batch.y),
            t=slc(fb.batch.t),
            p=slc(fb.batch.p),
            valid=slc(fb.batch.valid),
            count=batch.count,
        )
        priority = slc(fb.scatter_priority)

    # Global frame time window over the (possibly filtered) events
    # (2-scalar collectives over ICI).
    t_min, t_max = time_bounds(batch.t, batch.valid)
    t_min = jax.lax.pmin(t_min, axis_name)
    t_max = jax.lax.pmax(t_max, axis_name)

    res = compute_event_disparity(
        batch,
        tables.cam_mapx_i16,
        tables.cam_mapy_i16,
        tables.x_map,
        t_px_scale=cfg.t_px_scale,
        t_bounds=(t_min, t_max),
    )

    # Without a filter, the global event index (shard offset + lane) is the
    # last-write-wins priority; dedup filters supply a global dense rank.
    index_offset = shard * local_capacity
    if cfg.camera_perspective:
        packed = scatter_disp_packed(
            batch.y,
            batch.x,
            res.disp,
            res.inlier,
            height=cfg.camera_height,
            width=cfg.camera_width,
            index_offset=index_offset,
            priority=priority,
        )
        packed = jax.lax.pmax(packed, axis_name)
        disp_map = unpack_disp(packed)
        disp_for_depth = disp_map
    else:
        packed = scatter_disp_packed(
            res.y_rect,
            res.x_rect + res.disp.astype(jnp.int32),
            res.disp,
            res.inlier,
            height=cfg.rect_height,
            width=cfg.rect_width,
            index_offset=index_offset,
            priority=priority,
        )
        # Combine partial scatters: max of packed values == global
        # last-write-wins (all-reduce over ICI).
        packed = jax.lax.pmax(packed, axis_name)
        disp_rect = unpack_disp(packed)
        dilated = dilate_max(disp_rect, 7)
        disp_for_depth = remap_nearest_i16(
            dilated, tables.proj_mapx_i16, tables.proj_mapy_i16
        )
        disp_map = disp_for_depth

    depth = disparity_to_depth(disp_for_depth, tables.p03)
    norm_u8 = clip_normalize_u8(depth, cfg.z_near, cfg.z_far)
    frame = colorize_turbo(norm_u8)
    num_inliers = jax.lax.psum(jnp.sum(res.inlier).astype(jnp.int32), axis_name)
    return FrameResult(
        frame_bgr=frame, depth=depth, disp_map=disp_map, num_inliers=num_inliers
    )


def make_sharded_pipeline(
    cfg: PipelineConfig,
    tables: DeviceTables,
    mesh: Mesh,
    tail_plan=None,
    event_plan=None,
    pallas_interpret: bool = False,
):
    """Build the jitted multi-chip pipeline over stacked frame batches.

    Input: an EventBatch whose leaves carry a leading frame axis B
    (B % mesh['data'] == 0) and event capacity N (N % mesh['event'] == 0).
    Output: FrameResult with leading axis B, sharded over 'data' and
    replicated over 'event'.

    With a pure data-parallel mesh (event == 1) the optional Pallas plans
    (ops.pallas_tail / ops.pallas_events) run the full single-chip fused
    kernels on every device -- frames are independent, so per-chip
    performance matches the single-chip path exactly.  Event-sharded
    meshes use the XLA ops (the collectives cut through the fused stages).
    """
    ev_shards = mesh.shape["event"]
    local_capacity = cfg.event_capacity // ev_shards
    from xmaps_tpu.ops.scatter import PACK

    assert (cfg.event_capacity + 1) * PACK < 2**32, (
        f"event capacity {cfg.event_capacity} overflows the uint32 packing"
    )

    use_plans = ev_shards == 1 and (
        tail_plan is not None or event_plan is not None
    )

    batch_specs = EventBatch(
        x=P("data", "event"),
        y=P("data", "event"),
        t=P("data", "event"),
        p=P("data", "event"),
        valid=P("data", "event"),
        count=P("data"),
    )
    out_specs = FrameResult(
        frame_bgr=P("data"),
        depth=P("data"),
        disp_map=P("data"),
        num_inliers=P("data"),
    )

    if use_plans:
        from xmaps_tpu.ops.frame_pipeline import depth_frame

        def local_fn(batch: EventBatch, tables: DeviceTables) -> FrameResult:
            # static per-device frame count; unrolled python loop because
            # Pallas kernels do not support vmap batching
            b_local = batch.x.shape[0]
            outs = [
                depth_frame(
                    jax.tree.map(lambda a: a[i], batch),
                    tables,
                    cfg,
                    tail_plan=tail_plan,
                    event_plan=event_plan,
                    pallas_interpret=pallas_interpret,
                )
                for i in range(b_local)
            ]
            return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *outs)

    else:
        frame_fn = functools.partial(
            _frame_event_sharded,
            cfg=cfg,
            axis_name="event",
            local_capacity=local_capacity,
        )

        def local_fn(batch: EventBatch, tables: DeviceTables) -> FrameResult:
            return jax.vmap(frame_fn, in_axes=(0, None))(batch, tables)

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(batch_specs, P()),
        out_specs=out_specs,
        check_vma=False,
    )

    @jax.jit
    def pipeline(batch: EventBatch) -> FrameResult:
        return sharded(batch, tables)

    return pipeline


def make_group_sharded_pipeline(
    cfg: PipelineConfig,
    tables: DeviceTables,
    mesh: Mesh,
    tail_plan=None,
    event_plan=None,
    *,
    presort: str = "none",
    pallas_interpret: bool = False,
):
    """Data-parallel LIVE group pipeline: the engine's host-staged frame
    programs (fused Pallas kernels + host target-sort + runs scatter --
    the exact per-frame program ``process_frames`` dispatches) sharded
    over the mesh's ``data`` axis as ONE jitted shard_map program.

    This is the multi-camera / multi-sequence streaming regime scaled
    across chips (the moral equivalent of the reference's GNU-parallel
    fan-out, eval/x-map-eval.sh:49, but as a single device program over
    ICI): frames are independent, no collectives cross 'data', and each
    device runs the full single-chip fused pipeline on its shard -- so
    per-chip performance and results match the single-chip engine exactly
    (tests/test_sharding.py pins bit-equality).

    Input: (batch, prio, bands) with a leading frame axis B
    (B % mesh['data'] == 0), as produced by
    :func:`shard_staged_group`.  ``presort``: "none" (unsorted batches,
    prio/bands ignored), "prio" (host row-sorted), or "runs" (host
    target-sorted; the sort-free scatter).  Event-sharded meshes are not
    supported here -- use :func:`make_sharded_pipeline` for within-frame
    event parallelism.
    """
    assert mesh.shape["event"] == 1, (
        "group pipeline is data-parallel only; use make_sharded_pipeline "
        "for event-sharded meshes"
    )
    assert presort in ("none", "prio", "runs")
    from xmaps_tpu.ops.frame_pipeline import depth_frame

    def local_fn(batch, prio, bands, tables):
        b_local = batch.x.shape[0]
        outs = []
        for i in range(b_local):
            kw = {}
            if presort != "none":
                kw = dict(
                    presort_priority=prio[i],
                    # zero-width bands = the resident-plan marker
                    presort_bands=bands[i] if bands.shape[1] else None,
                    presort_runs=presort == "runs",
                )
            outs.append(
                depth_frame(
                    jax.tree.map(lambda a: a[i], batch),
                    tables,
                    cfg,
                    tail_plan=tail_plan,
                    event_plan=event_plan,
                    pallas_interpret=pallas_interpret,
                    **kw,
                )
            )
        return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *outs)

    batch_specs = EventBatch(
        x=P("data"), y=P("data"), t=P("data"), p=P("data"),
        valid=P("data"), count=P("data"),
    )
    out_specs = FrameResult(
        frame_bgr=P("data"),
        depth=P("data"),
        disp_map=P("data"),
        num_inliers=P("data"),
    )
    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(batch_specs, P("data"), P("data"), P()),
        out_specs=out_specs,
        check_vma=False,
    )

    @jax.jit
    def pipeline(batch, prio, bands):
        return sharded(batch, prio, bands, tables)

    return pipeline


def shard_staged_group(staged: Sequence, mesh: Mesh) -> tuple:
    """Stack host-staged (batch, priority, bands) triples (from
    XMapsDepthEngine.make_sorted_batch, or (batch, None, None)) along a
    leading frame axis and place the shards on the mesh's 'data' axis.

    Returns (batch, prio, bands) ready for
    :func:`make_group_sharded_pipeline`; prio/bands are zero-width
    placeholders when the staging carried none (uniform pytree structure
    keeps one compiled program per (B, presort) shape).
    """
    data_sharding = NamedSharding(mesh, P("data"))
    batches = [s[0] for s in staged]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *batches)
    batch = jax.tree.map(
        lambda a: jax.device_put(a, data_sharding), stacked
    )
    B = len(staged)
    if staged[0][1] is None:
        prio = jnp.zeros((B, 0), jnp.int32)
    else:
        prio = jnp.stack([jnp.asarray(s[1]) for s in staged], axis=0)
    if staged[0][2] is None:
        bands = jnp.zeros((B, 0, 2), jnp.int32)
    else:
        bands = jnp.stack([jnp.asarray(s[2]) for s in staged], axis=0)
    return (
        batch,
        jax.device_put(prio, data_sharding),
        jax.device_put(bands, data_sharding),
    )


def shard_batches(
    batches: Sequence[EventBatch], mesh: Mesh, cfg: PipelineConfig
) -> EventBatch:
    """Stack per-frame EventBatches along a leading axis and place them
    according to the mesh sharding (host -> HBM)."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *batches)
    sharding = NamedSharding(mesh, P("data", "event"))
    scalar_sharding = NamedSharding(mesh, P("data"))
    return EventBatch(
        x=jax.device_put(stacked.x, sharding),
        y=jax.device_put(stacked.y, sharding),
        t=jax.device_put(stacked.t, sharding),
        p=jax.device_put(stacked.p, sharding),
        valid=jax.device_put(stacked.valid, sharding),
        count=jax.device_put(stacked.count, scalar_sharding),
    )
