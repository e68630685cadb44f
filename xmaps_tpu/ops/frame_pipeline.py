"""The fused per-frame depth program (device).

Composes the per-event stage (rectify -> X-map lookup -> disparity), the
deterministic scatter, and the dense image tail into ONE jitted XLA
program, mirroring the reference's per-frame path process_ev_frame
(depth_reprojection_pipe.py:121-167) minus display.  Both render
perspectives are supported:

- projector view (default): scatter into the rectified frame, dilate,
  remap to projector resolution (depth_reprojection_pipe.py:153-162);
- camera view: scatter at raw event coordinates
  (cam_proj_calibration.py:312-317).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from xmaps_tpu.config import PipelineConfig
from xmaps_tpu.ops.disparity import compute_event_disparity
from xmaps_tpu.ops.event_batch import EventBatch
from xmaps_tpu.ops.image_tail import (
    clip_normalize_u8,
    colorize_turbo,
    dilate_max,
    disparity_to_depth,
    remap_nearest_i16,
)
__all__ = ["DeviceTables", "FrameResult", "depth_frame", "make_depth_frame_fn"]


class DeviceTables(NamedTuple):
    """Precomputed LUTs resident in HBM (built once per session from
    calib.CamProjMaps; see models/depth_pipeline.py)."""

    cam_mapx_i16: jax.Array  # (H_cam, W_cam) int16: cam px -> rect x
    cam_mapy_i16: jax.Array  # (H_cam, W_cam) int16: cam px -> rect y
    cam_map_packed: jax.Array  # (H_cam, W_cam) int32: mapy<<16 | mapx
    x_map: jax.Array  # (H_rect, W_time) int16
    proj_mapx_i16: jax.Array  # (H_proj, W_proj) int16: proj px -> rect x
    proj_mapy_i16: jax.Array  # (H_proj, W_proj) int16: proj px -> rect y
    p03: jax.Array  # scalar f32: P2[0, 3] (baseline * focal)

    @staticmethod
    def from_maps(cam_proj_maps, x_map: np.ndarray) -> "DeviceTables":
        from xmaps_tpu.ops.disparity import pack_rect_maps

        m = cam_proj_maps
        return DeviceTables(
            cam_mapx_i16=jnp.asarray(m.disp_cam_mapx_i16),
            cam_mapy_i16=jnp.asarray(m.disp_cam_mapy_i16),
            cam_map_packed=pack_rect_maps(
                m.disp_cam_mapx_i16, m.disp_cam_mapy_i16
            ),
            x_map=jnp.asarray(x_map),
            proj_mapx_i16=jnp.asarray(m.disp_proj_mapx_i16),
            proj_mapy_i16=jnp.asarray(m.disp_proj_mapy_i16),
            p03=jnp.asarray(np.float32(m.P2[0, 3])),
        )


class FrameResult(NamedTuple):
    frame_bgr: jax.Array  # (H_out, W_out, 3) uint8 colorized depth
    depth: jax.Array  # (H_out, W_out) float32 metric depth (0 = undefined)
    disp_map: jax.Array  # view-dependent disparity map, float32
    num_inliers: jax.Array  # int32


def depth_frame(
    batch: EventBatch,
    tables: DeviceTables,
    cfg: PipelineConfig,
    tail_plan=None,
    event_plan=None,
    pallas_interpret: bool = False,
    t_scaled=None,
    presort_priority=None,
    presort_bands=None,
    presort_runs: bool = False,
    presort_unique: bool = False,
    host_num_inliers=None,
    display_only: bool = False,
    display_packed: bool = False,
) -> FrameResult:
    """One projector frame of events -> colorized depth map.

    Trace-time static: cfg (shapes/sizes), dynamic: batch + tables.
    When ``tail_plan`` (ops.pallas_tail.TailPlan) is provided and the view
    is the projector's, the dense tail (dilate/remap/depth/colorize) runs
    as the fused Pallas kernel (~30x faster than the XLA chain on TPU);
    otherwise the XLA ops are used (CPU tests, camera view, sharded mesh).
    When ``event_plan`` (ops.pallas_events.EventGatherPlan) is provided,
    the per-event gathers run as the fused banded Pallas kernel over
    device-sorted events (bit-identical results; requires integer
    timestamps and no frame filter -- silently falls back otherwise).
    ``t_scaled`` (int32 X-map time bins, precomputed exactly on the host
    by io.prefetch compact staging) skips the on-device time
    normalization; only valid with ``frame_filter == "none"`` (filters
    change the frame's time bounds, so bins must be computed after
    filtering).
    ``presort_priority`` (int32 original-arrival indices from
    EventBatch.from_structured_sorted) marks the batch as already y-sorted
    on the host, skipping the device sort in the Pallas event path --
    bit-identical results, ~36 us less device time per frame at 28k.
    ``presort_runs`` additionally marks the host sort key as the SCATTER
    TARGET (rectified row + raw X-map value for the projector view, raw
    coordinates for the camera view -- make_sorted_batch computes both
    exactly), so same-pixel lanes are contiguous and the scatter skips
    its own device sort too (ops.scatter method="runs", ~23 us less).
    ``presort_unique`` marks the batch as a host-COMPACTED winner batch
    (models.depth_pipeline.make_winner_batch): every valid lane targets a
    distinct pixel and is that pixel's winner, so the event kernel runs
    on ~winner-count lanes and the scatter is a bare unique-indices set
    (ops.scatter method="set").  Requires ``host_num_inliers`` (the
    host-mirrored inlier count -- the compacted batch no longer carries
    the losing inlier lanes) plus ``t_scaled`` (time bins must come from
    the FULL frame's bounds, which the compacted batch cannot recover).
    ``display_only`` returns FrameResult with depth and disp_map as None
    -- the reference's per-frame output surface (disp_to_depth.py emits
    only the colorized frame; depth/disparity are intermediates).  The
    fused kernels then skip two full-resolution f32 output stores, and
    the XLA paths dead-code-eliminate the unused math.
    ``display_packed`` (requires display_only) emits frame_bgr as ONE
    (H, W) uint32 packed-BGR plane (B | G<<8 | R<<16) instead of
    (H, W, 3) u8: the device-side channel split + 3-plane interleave
    disappear entirely; unpack on the host with
    ``arr.view(np.uint8).reshape(H, W, 4)[..., :3]`` at display rate.
    """
    from xmaps_tpu.ops.disparity import (
        compute_event_disparity_pallas,
        rectify_events_packed,
    )
    from xmaps_tpu.ops.filters import apply_frame_filter
    from xmaps_tpu.ops.scatter import scatter_disp_packed, unpack_disp

    if t_scaled is not None and cfg.frame_filter != "none":
        raise ValueError(
            "precomputed t_scaled requires frame_filter == 'none' "
            "(filters change the frame's time bounds)"
        )

    use_pallas_events = (
        event_plan is not None
        and cfg.frame_filter == "none"
        and jnp.issubdtype(batch.t.dtype, jnp.integer)
    )

    if (
        presort_priority is not None or presort_bands is not None
    ) and not use_pallas_events:
        raise ValueError(
            "presort_priority/presort_bands are only consumed by the "
            "Pallas event path (event_plan set, no frame filter, integer "
            "timestamps)"
        )
    if presort_runs and presort_priority is None:
        raise ValueError(
            "presort_runs requires a host-sorted batch (presort_priority): "
            "run contiguity is a property of the host sort key"
        )
    if presort_unique:
        if presort_priority is None or host_num_inliers is None or t_scaled is None:
            raise ValueError(
                "presort_unique requires a host-compacted winner batch: "
                "presort_priority (original arrival indices), "
                "host_num_inliers (the compacted batch lost the losing "
                "inlier lanes), and t_scaled (full-frame time bounds)"
            )
        if presort_runs:
            raise ValueError("presort_unique and presort_runs are exclusive")
    if display_packed and not display_only:
        raise ValueError(
            "display_packed emits only the packed colorized plane; it "
            "requires display_only"
        )

    if use_pallas_events:
        res, (ev_x, ev_y), priority = compute_event_disparity_pallas(
            batch,
            event_plan,
            t_px_scale=cfg.t_px_scale,
            t_scaled=t_scaled,
            presorted_priority=presort_priority,
            presorted_bands=presort_bands,
            interpret=pallas_interpret,
        )
    else:
        ev_x, ev_y = batch.x, batch.y
        xr, yr = rectify_events_packed(batch.x, batch.y, tables.cam_map_packed)
        priority = None
        if cfg.frame_filter != "none":
            fb = apply_frame_filter(
                batch,
                xr,
                name=cfg.frame_filter,
                camera_width=cfg.camera_width,
                camera_height=cfg.camera_height,
                rect_width=cfg.rect_width,
            )
            batch = fb.batch
            priority = fb.scatter_priority
            ev_x, ev_y = batch.x, batch.y

        res = compute_event_disparity(
            batch,
            tables.cam_mapx_i16,
            tables.cam_mapy_i16,
            tables.x_map,
            t_px_scale=cfg.t_px_scale,
            rect_coords=(xr, yr),
            t_scaled=t_scaled,
        )

    from xmaps_tpu.ops.scatter import PACK

    if host_num_inliers is not None:
        num_inliers = jnp.asarray(host_num_inliers, jnp.int32)
    else:
        num_inliers = jnp.sum(res.inlier).astype(jnp.int32)

    # The sort-dedup scatter strategy wins on TPU (unique-indices set
    # parallelizes; duplicate-capable max serializes) -- see ops.scatter.
    # Host target-sorted batches upgrade to "runs" (no device sort at all).
    scatter_method = "sorted" if use_pallas_events else "max"
    run_keys = None
    if presort_unique:
        scatter_method = "set"
    elif presort_runs:
        scatter_method = "runs"
        if cfg.camera_perspective:
            run_keys = (ev_y, ev_x)
        else:
            # clipped row + raw X-map value: the exact key the host
            # sorted by, defined for every lane (rejects included)
            h_xmap = tables.x_map.shape[0]
            run_keys = (
                jnp.clip(res.y_rect, 0, h_xmap - 1),
                res.x_proj,
            )

    if cfg.camera_perspective:
        if tail_plan is not None:
            # fused camera-view tail (ops.pallas_tail.CamTailPlan):
            # scatter packed at padded camera dims, unpack + depth +
            # normalize + colorize in one kernel pass
            from xmaps_tpu.ops.pallas_tail import pallas_colorize

            packed_map = scatter_disp_packed(
                ev_y,
                ev_x,
                res.disp,
                res.inlier,
                height=cfg.camera_height,
                width=cfg.camera_width,
                priority=priority,
                pad_shape=(tail_plan.H_pad, tail_plan.W_pad),
                method=scatter_method,
                run_keys=run_keys,
            )
            frame, depth, disp_map = pallas_colorize(
                packed_map,
                tail_plan,
                interpret=pallas_interpret,
                pack=PACK,
                emit_aux=not display_only,
                packed_bgr=display_packed,
            )
            return FrameResult(
                frame_bgr=frame,
                depth=depth,
                disp_map=disp_map,
                num_inliers=num_inliers,
            )
        disp_map = unpack_disp(
            scatter_disp_packed(
                ev_y,
                ev_x,
                res.disp,
                res.inlier,
                height=cfg.camera_height,
                width=cfg.camera_width,
                priority=priority,
                method=scatter_method,
                run_keys=run_keys,
            )
        )
        disp_for_depth = disp_map
    else:
        if tail_plan is not None:
            # fused path: scatter the packed map directly at the tail
            # kernel's padded CROP dims (the kernel never reads outside
            # its crop window; targets beyond it are invisible) and let
            # the kernel unpack in-band (saves two full-image passes:
            # unpack + pad)
            from xmaps_tpu.ops.pallas_tail import pallas_tail

            packed_map = scatter_disp_packed(
                res.y_rect,
                res.x_rect + res.disp.astype(jnp.int32),
                res.disp,
                res.inlier,
                height=cfg.rect_height,
                width=cfg.rect_width,
                priority=priority,
                pad_shape=(tail_plan.H_pad, tail_plan.W_pad),
                method=scatter_method,
                run_keys=run_keys,
                window=(
                    tail_plan.crop_row0,
                    tail_plan.crop_col0,
                    tail_plan.H,
                    tail_plan.W,
                ),
            )
            frame, depth, disp_map = pallas_tail(
                packed_map,
                tail_plan,
                interpret=pallas_interpret,
                pack=PACK,
                emit_aux=not display_only,
                packed_bgr=display_packed,
            )
            return FrameResult(
                frame_bgr=frame,
                depth=depth,
                disp_map=disp_map,
                num_inliers=num_inliers,
            )
        disp_rect = unpack_disp(
            scatter_disp_packed(
                res.y_rect,
                res.x_rect + res.disp.astype(jnp.int32),
                res.disp,
                res.inlier,
                height=cfg.rect_height,
                width=cfg.rect_width,
                priority=priority,
            )
        )
        dilated = dilate_max(disp_rect, 7)
        disp_for_depth = remap_nearest_i16(
            dilated, tables.proj_mapx_i16, tables.proj_mapy_i16
        )
        disp_map = disp_for_depth

    depth = disparity_to_depth(disp_for_depth, tables.p03)
    norm_u8 = clip_normalize_u8(depth, cfg.z_near, cfg.z_far)
    if display_packed:
        from xmaps_tpu.ops.image_tail import colorize_turbo_packed

        frame = colorize_turbo_packed(norm_u8)
    else:
        frame = colorize_turbo(norm_u8)
    return FrameResult(
        frame_bgr=frame,
        depth=None if display_only else depth,
        disp_map=None if display_only else disp_map,
        num_inliers=num_inliers,
    )


def make_depth_frame_fn(
    cfg: PipelineConfig,
    tail_plan=None,
    event_plan=None,
    pallas_interpret: bool = False,
):
    """Build the jitted frame function with cfg (and optional Pallas tail /
    event-gather plans) baked in.

    Batch-buffer donation was evaluated and intentionally not used: the
    program's outputs (projector-resolution images + a scalar) share no
    shape/dtype with the event arrays, so XLA cannot alias donated
    buffers into outputs (it warns "donated buffers were not usable").
    Host-side buffer reuse lives in io.prefetch.HostStagingPool instead.
    """
    fn = functools.partial(
        depth_frame,
        cfg=cfg,
        tail_plan=tail_plan,
        event_plan=event_plan,
        pallas_interpret=pallas_interpret,
    )
    return jax.jit(fn)
