"""XMapsDepthEngine: the flagship event->depth model.

Owns the one-time init (calibration load, LUT construction, X-map build --
reference init path SURVEY.md §3.4) and the per-frame jitted program.  This
is the device-side counterpart of the reference's DepthReprojectionPipe
setup (depth_reprojection_pipe.py:64-108); streaming orchestration lives in
xmaps_tpu.runtime.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from xmaps_tpu.calib.maps import CalibrationParams, CamProjMaps
from xmaps_tpu.config import PipelineConfig, RuntimeParams
from xmaps_tpu.ops.event_batch import EventBatch
from xmaps_tpu.ops.frame_pipeline import (
    DeviceTables,
    FrameResult,
    make_depth_frame_fn,
)
from xmaps_tpu.ops.xmap import build_x_map, build_x_map_numpy


def _named_partial(fn, name: str, **kw):
    """functools.partial whose __name__ survives into the jitted HLO
    module name (``jit_<name>``), so profiler traces identify the frame
    programs instead of showing ``jit__unknown``."""
    import functools

    p = functools.partial(fn, **kw)
    p.__name__ = name
    return p


def display_out_shardings(device=None):
    """out_shardings pinning the packed-display output row-major on TPU.

    The streaming programs end in the Pallas tail kernel, whose display
    plane is written in row-major ({1,0}) tiled layout.  Left to itself,
    XLA picks the minimum-tile-padding layout for entry outputs -- {0,1}
    at 1920x1080 -- and inserts a full-image relayout copy on the seam
    (measured 14.2 us/frame at the ESL eval geometry, eval/profile_trace).
    The host consumes the plane row-major anyway (numpy view unpack,
    runtime/pipe.py), so pin the output to the kernel's native layout.
    Returns None (use jit defaults) off-TPU: the CPU backend has no tiled
    layouts and the tests compare values, not layouts.

    ``device``: the device the engine's inputs/tables live on; defaults
    to ``jax.devices()[0]``.  Pass the engine's actual device on
    multi-chip hosts -- a mismatched SingleDeviceSharding would force a
    cross-device transfer (or error) in every streaming jit.
    """
    dev = device if device is not None else jax.devices()[0]
    if dev.platform != "tpu":
        return None
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    sds = SingleDeviceSharding(dev)
    return FrameResult(
        frame_bgr=Format(Layout(major_to_minor=(0, 1)), sds),
        depth=None,
        disp_map=None,
        num_inliers=sds,
    )


def _xmap_cache_key(time_map: np.ndarray, x_map_width: int, t_px_scale: int,
                    num_scanlines: int) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(time_map).tobytes())
    h.update(f"{x_map_width}|{t_px_scale}|{num_scanlines}".encode())
    return h.hexdigest()[:24]


@dataclass
class XMapsDepthEngine:
    """End-to-end depth pipeline bound to one calibration.

    Build with :meth:`from_calibration` (or :meth:`from_runtime_params` for
    CLI use).  ``process_frame`` turns one frame's events into a colorized
    depth map in a single device program.
    """

    cfg: PipelineConfig
    maps: CamProjMaps
    tables: DeviceTables
    x_map_np: np.ndarray
    time_map_rect: np.ndarray
    tail_plan: object = None  # ops.pallas_tail.TailPlan when enabled
    event_plan: object = None  # ops.pallas_events.EventGatherPlan when enabled

    _frame_fn: object = field(init=False, default=None, repr=False)
    _staged_fn: object = field(init=False, default=None, repr=False)
    _staged_compact_fn: object = field(init=False, default=None, repr=False)
    _ring_fn: object = field(init=False, default=None, repr=False)
    #: io.prefetch.CompactLayout when 1-word staging is available
    compact_layout: object = field(init=False, default=None, repr=False)

    def __post_init__(self):
        self._build_frame_fns()

    def _build_frame_fns(self):
        import functools

        import jax

        from xmaps_tpu.io.prefetch import (
            CompactLayout,
            RingLayout,
            assemble_ring_frame,
            assemble_ring_frame_compact,
            unpack_staged,
            unpack_staged_compact,
        )
        from xmaps_tpu.ops.frame_pipeline import depth_frame

        self._frame_fn = make_depth_frame_fn(
            self.cfg,
            tail_plan=self.tail_plan,
            event_plan=self.event_plan,
        )

        # Pin the packed-display output to the tail kernel's row-major
        # layout on TPU (kills a full-image relayout copy per frame).
        # Derive the device from the tables so an engine committed to a
        # non-default chip pins to ITS device, not jax.devices()[0].
        tbl_dev = getattr(self.tables.x_map, "device", None)
        disp_fmt = display_out_shardings(
            tbl_dev if hasattr(tbl_dev, "platform") else None
        )
        jit_kw = {} if disp_fmt is None else {"out_shardings": disp_fmt}

        # The streaming programs run display-only: the runtime's frame
        # callback consumes the colorized frame + the inlier count, and
        # the reference's per-frame path likewise emits only the frame
        # (depth/disparity are intermediates, disp_to_depth.py).  The
        # fused kernels then skip two full-resolution f32 output stores.
        def staged_frame(staged, tables, cfg):
            return depth_frame(
                unpack_staged(staged),
                tables,
                cfg,
                tail_plan=self.tail_plan,
                event_plan=self.event_plan,
                display_only=True,
                display_packed=True,
            )

        self._staged_fn = jax.jit(
            _named_partial(staged_frame, "staged_frame", cfg=self.cfg),
            **jit_kw,
        )

        def ring_frame(xys, tps, meta, tables, cfg):
            batch = assemble_ring_frame(xys, tps, meta, cfg.event_capacity)
            return depth_frame(
                batch,
                tables,
                cfg,
                tail_plan=self.tail_plan,
                event_plan=self.event_plan,
                display_only=True,
                display_packed=True,
            )

        self._ring_fn = jax.jit(
            _named_partial(ring_frame, "ring_frame", cfg=self.cfg),
            **jit_kw,
        )

        # compact (one-word) ring staging: valid whenever the camera dims
        # leave >= 13 t_rel bits (io.prefetch.RingLayout) -- the pipe
        # stages post-polarity-filter, satisfying the p == 1 contract
        self.ring_layout = RingLayout.for_camera(
            self.cfg.camera_width, self.cfg.camera_height
        )
        self._ring_compact_fn = None
        if self.ring_layout is not None:
            rlayout = self.ring_layout

            def ring_frame_compact(ws, meta, tables, cfg):
                batch = assemble_ring_frame_compact(
                    ws, meta, cfg.event_capacity, rlayout
                )
                return depth_frame(
                    batch,
                    tables,
                    cfg,
                    tail_plan=self.tail_plan,
                    event_plan=self.event_plan,
                    display_only=True,
                    display_packed=True,
                )

            self._ring_compact_fn = jax.jit(
                _named_partial(
                    ring_frame_compact, "ring_frame_compact", cfg=self.cfg
                ),
                **jit_kw,
            )

        # 1-word-per-event staging layout (pure geometry; None if the
        # dims don't fit 32 bits).  The jitted consumer exists only for
        # unfiltered pipelines: the dedup filters re-bin time after
        # dropping events, so they need raw timestamps (2-word staging).
        self.compact_layout = CompactLayout.for_pipeline(self.cfg)
        self._staged_compact_fn = None
        if self.compact_layout is not None and self.cfg.frame_filter == "none":
            layout = self.compact_layout

            def staged_compact_frame(staged, tables, cfg):
                batch, ts = unpack_staged_compact(staged, layout)
                kw = {}
                if staged.bands is not None and self.event_plan is not None:
                    # host target-sorted staging (compact_presort): the
                    # stable sort preserves arrival order within a target,
                    # so the lane index IS a valid last-write-wins
                    # priority -- no priority upload needed
                    kw = dict(
                        presort_priority=jnp.arange(
                            batch.x.shape[0], dtype=jnp.int32
                        ),
                        presort_bands=(
                            staged.bands if staged.bands.shape[0] else None
                        ),
                        presort_runs=True,
                    )
                return depth_frame(
                    batch,
                    tables,
                    cfg,
                    tail_plan=self.tail_plan,
                    event_plan=self.event_plan,
                    t_scaled=ts,
                    display_only=True,
                    display_packed=True,
                    **kw,
                )

            self._staged_compact_fn = jax.jit(
                _named_partial(
                    staged_compact_frame, "staged_compact_frame", cfg=self.cfg
                ),
                **jit_kw,
            )

    # -- construction --------------------------------------------------

    @staticmethod
    def from_calibration(
        calib: CalibrationParams,
        *,
        event_capacity: int = 65536,
        z_near: float = 0.1,
        z_far: float = 1.0,
        camera_perspective: bool = False,
        scan_upwards: bool = True,
        # False = the reference's EXECUTED border behavior (its
        # border_mode lands in cv2.remap's dst slot and never applies;
        # see calib.maps.build_rectified_time_map)
        border_replicate: bool = False,
        zero_undistort_proj_map: bool = False,
        projector_time_map_path: Optional[str] = None,
        xmap_cache_dir: Optional[str] = None,
        use_device_xmap_build: bool = True,
        use_pallas_tail: Optional[bool] = None,
        use_pallas_events: Optional[bool] = None,
        tail_tile: Optional[tuple] = None,
    ) -> "XMapsDepthEngine":
        import time as _time

        _trace = os.environ.get("XMAPS_SETUP_TRACE") == "1"
        _t0 = _time.perf_counter()
        _timings: list = []  # (label, seconds since previous mark)
        _prev = [_t0]

        def _mark(label):
            now = _time.perf_counter()
            _timings.append((label, now - _prev[0]))
            _prev[0] = now
            if _trace:
                import sys

                print(
                    f"[setup +{now - _t0:7.2f}s] {label}",
                    file=sys.stderr,
                    flush=True,
                )

        cfg = PipelineConfig(
            camera_width=calib.camera_width,
            camera_height=calib.camera_height,
            projector_width=calib.projector_width,
            projector_height=calib.projector_height,
            rect_width=calib.rect_image_width,
            rect_height=calib.rect_image_height,
            event_capacity=event_capacity,
            z_near=z_near,
            z_far=z_far,
            camera_perspective=camera_perspective,
        )
        maps = CamProjMaps.build_cached(
            calib,
            zero_undistort_proj_map=zero_undistort_proj_map,
            cache_dir=xmap_cache_dir,
        )
        _mark("CamProjMaps (host calibration math, disk-cached)")

        if projector_time_map_path is not None:
            # precalibrated rectified time map (reference proj_time_map.py:47-49)
            time_map_rect = np.load(projector_time_map_path)
        else:
            time_map_rect = maps.build_rectified_time_map(
                scan_upwards=scan_upwards, border_replicate=border_replicate
            )

        x_map_np = XMapsDepthEngine._build_or_load_xmap(
            time_map_rect, cfg, xmap_cache_dir, use_device_xmap_build
        )
        _mark("X-map build/load")

        tables = DeviceTables.from_maps(maps, x_map_np)
        _mark("DeviceTables H2D")

        # The fused Pallas kernels are TPU-specific (Mosaic lowering); CPU
        # tests and other accelerators use the XLA path.
        on_accel = jax.devices()[0].platform not in (
            "cpu", "gpu", "cuda", "rocm"
        )
        if use_pallas_tail is None:
            use_pallas_tail = on_accel
        tail_plan = None
        if use_pallas_tail and camera_perspective:
            from xmaps_tpu.ops.pallas_tail import build_cam_tail_plan

            tail_plan = build_cam_tail_plan(
                calib.camera_height,
                calib.camera_width,
                p03=float(maps.P2[0, 3]),
                z_near=z_near,
                z_far=z_far,
            )
        elif use_pallas_tail:
            tail_plan = XMapsDepthEngine._build_or_load_tail_plan(
                maps, calib, z_near, z_far, tail_tile, xmap_cache_dir
            )

        if use_pallas_events is None:
            use_pallas_events = on_accel
        event_plan = None
        if use_pallas_events:
            from xmaps_tpu.ops.pallas_events import (
                BLOCK,
                build_event_gather_hbm_plan,
                build_event_gather_plan,
                tables_fit_vmem,
            )

            # Pack the camera LUT on the HOST for the plan builders:
            # passing tables.cam_map_packed (a device array) made the
            # builders' np.asarray the session's FIRST device->host
            # fetch, which the tunneled runtime can stall on for minutes
            # (SETUP_r05.json attributed 216 s of the ~236 s cold build
            # to exactly this).  The H2D warmups never cover D2H.
            cam_packed_np = (
                (maps.disp_cam_mapy_i16.astype(np.int32) << 16)
                | (maps.disp_cam_mapx_i16.astype(np.int32) & 0xFFFF)
            )
            if event_capacity % BLOCK == 0:
                if tables_fit_vmem(
                    (calib.camera_height, calib.camera_width), x_map_np.shape
                ):
                    event_plan = build_event_gather_plan(
                        cam_packed_np, x_map_np
                    )
                else:
                    # large rigs (e.g. the ESL eval geometry's 26 MB
                    # X-map): stream X-map row bands from HBM per block
                    event_plan = build_event_gather_hbm_plan(
                        cam_packed_np, x_map_np
                    )

        _mark("pallas plans built")
        eng = XMapsDepthEngine(
            cfg=cfg,
            maps=maps,
            tables=tables,
            x_map_np=x_map_np,
            time_map_rect=time_map_rect,
            tail_plan=tail_plan,
            event_plan=event_plan,
        )
        _mark("frame fns wrapped (jit, untraced)")
        #: per-step wall-clock breakdown of this build, for
        #: eval/profile_setup.py (cold-start attribution, SETUP_r05)
        eng.setup_timings = list(_timings)
        return eng

    @staticmethod
    def from_runtime_params(params: RuntimeParams, **kw) -> "XMapsDepthEngine":
        calib = CalibrationParams.from_yaml(
            params.calib,
            params.camera_width,
            params.camera_height,
            params.projector_width,
            params.projector_height,
        )
        # CLI sessions reuse the X-map across runs (checkpoint/resume
        # analog, SURVEY.md §5); the key hashes the time map + geometry.
        kw.setdefault(
            "xmap_cache_dir", os.path.expanduser("~/.cache/xmaps_tpu")
        )
        return XMapsDepthEngine.from_calibration(
            calib,
            z_near=params.z_near,
            z_far=params.z_far,
            camera_perspective=params.camera_perspective,
            projector_time_map_path=params.projector_time_map,
            **kw,
        )

    @staticmethod
    def _build_or_load_tail_plan(
        maps, calib, z_near, z_far, tail_tile, cache_dir
    ):
        """Build the tail kernel's gather plan, with the same disk cache
        as the X-map: the plan is a pure function of the projector maps
        and parameters, and its host build (per-row collision-slot maps)
        is the longest remaining setup step (~12 s on a 1-core host)."""
        import dataclasses

        from xmaps_tpu.ops.pallas_tail import TailPlan, build_tail_plan

        key = None
        cache_path = None
        if cache_dir:
            h = hashlib.sha256()
            h.update(np.ascontiguousarray(maps.disp_proj_mapx_i16).tobytes())
            h.update(np.ascontiguousarray(maps.disp_proj_mapy_i16).tobytes())
            h.update(
                f"{calib.rect_image_height}|{calib.rect_image_width}|"
                f"{float(maps.P2[0, 3])}|{z_near}|{z_far}|{tail_tile}|v7"
                .encode()
            )
            key = h.hexdigest()[:24]
            os.makedirs(cache_dir, exist_ok=True)
            cache_path = os.path.join(cache_dir, f"tailplan_{key}.npz")
            if os.path.exists(cache_path):
                with np.load(cache_path) as z:
                    fields = {}
                    for f in dataclasses.fields(TailPlan):
                        v = z[f.name]
                        fields[f.name] = (
                            v if v.ndim else v.item()
                        )
                    return TailPlan(**fields)

        plan = build_tail_plan(
            maps.disp_proj_mapx_i16,
            maps.disp_proj_mapy_i16,
            calib.rect_image_height,
            calib.rect_image_width,
            p03=float(maps.P2[0, 3]),
            z_near=z_near,
            z_far=z_far,
            **({"tile": tuple(tail_tile)} if tail_tile else {}),
        )
        if cache_path:
            np.savez(
                cache_path,
                **{
                    f.name: getattr(plan, f.name)
                    for f in dataclasses.fields(TailPlan)
                },
            )
        return plan

    @staticmethod
    def _build_or_load_xmap(
        time_map_rect: np.ndarray,
        cfg: PipelineConfig,
        cache_dir: Optional[str],
        use_device: bool,
    ) -> np.ndarray:
        """Build the X-map (the heavy init step), with optional disk cache
        -- the checkpoint/resume analog of this framework (SURVEY.md §5)."""
        key = _xmap_cache_key(
            time_map_rect, cfg.x_map_width, cfg.t_px_scale, cfg.projector_width
        )
        cache_path = None
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            cache_path = os.path.join(cache_dir, f"xmap_{key}.npy")
            if os.path.exists(cache_path):
                return np.load(cache_path)

        if use_device:
            x_map, _ = build_x_map(
                jnp.asarray(time_map_rect),
                x_map_width=cfg.x_map_width,
                t_px_scale=cfg.t_px_scale,
                num_scanlines=cfg.projector_width,
            )
            x_map = np.asarray(jax.device_get(x_map))
        else:
            x_map, _ = build_x_map_numpy(
                time_map_rect,
                x_map_width=cfg.x_map_width,
                t_px_scale=cfg.t_px_scale,
                num_scanlines=cfg.projector_width,
            )

        if cache_path:
            np.save(cache_path, x_map)
        return x_map

    # -- per-frame API ---------------------------------------------------

    def make_batch(self, events: np.ndarray) -> EventBatch:
        return EventBatch.from_structured(events, self.cfg.event_capacity)

    class SortedBatch(tuple):
        """(batch, priority, bands) with a host-side ``runs_ok`` flag.

        Unpacks like the plain 3-tuple callers always used.  ``runs_ok``
        records whether the sort key carried the EXACT scatter target
        (only possible for integer timestamps, which the host time-binning
        mirrors bit-for-bit) -- i.e. whether the batch satisfies the
        "runs" scatter's same-target-contiguity contract (ops.scatter
        method="runs").  A rectified-row-only sort (float timestamps)
        still helps the event kernel's banding but must NOT enable the
        sort-free scatter: same-target lanes would not be contiguous and
        the unique-indices scatter-set would silently emit multiple
        winners per pixel.
        """

        runs_ok: bool

        def __new__(cls, batch, priority, bands, runs_ok):
            self = super().__new__(cls, (batch, priority, bands))
            self.runs_ok = bool(runs_ok)
            return self

    def make_sorted_batch(self, events: np.ndarray):
        """Host-staged batch in the event kernel's preferred order, plus
        the carried priorities and (for HBM plans) exact per-block X-map
        row bands.

        The primary sort key is the RECTIFIED row (one host LUT lookup per
        event, folded into the staging copy): a 1024-event block then spans
        the events' true X-map row range instead of the raw-row proxy --
        the HBM kernel's streamed bands tighten (roughly halved at the
        ESL eval geometry) and the resident kernel's in-kernel
        min/max row loop narrows the same way.  For HBM plans the exact
        bounds additionally ship as a (n/BLOCK, 2) i32 array.

        For integer timestamps the secondary key is the SCATTER TARGET,
        which the host can mirror exactly: the raw X-map value
        x_map[yg, clip(t_bin)] for the projector view (the host reuses the
        exact integer time-binning of io.prefetch compact staging), or the
        raw coordinates for the camera view.  Same-target lanes are then
        contiguous, so the device scatter skips its sort and finds each
        pixel's winner with a cheap run scan (ops.scatter method="runs",
        wired by _group_fn via depth_frame(presort_runs=True)).

        Returns (batch, priority, bands); bands is None for resident
        plans (the kernel computes its own).  Results are bit-identical
        regardless of sort order (the priority carries the arrival
        index).
        """
        from xmaps_tpu.io.prefetch import _scale_time_int_host
        from xmaps_tpu.ops.pallas_events import EventGatherHBMPlan

        cap = self.cfg.event_capacity
        n = min(len(events), cap)
        events = events[:n]
        if n and not np.issubdtype(events.dtype["t"].type, np.integer):
            # EventBatch.from_structured_sorted stores t as int64 -- a
            # float stream would be silently truncated AND the row-only
            # fallback key would break the runs scatter's contiguity
            # contract downstream.  Integer timestamps are what every real
            # EVT stream carries; float streams take the unsorted path.
            raise ValueError(
                "make_sorted_batch requires integer timestamps (host "
                "target-sorting mirrors the integer time binning); use "
                "make_batch/process_frame for float-t streams"
            )
        ts = None
        if n:
            ts = _scale_time_int_host(events["t"], self.cfg.t_px_scale)
        yg, key, _ = self._host_target_key(events, ts)
        batch, prio = EventBatch.from_structured_sorted(events, cap, key=key)

        # runs_ok: the "runs" scatter contract holds only when the key
        # carried the exact scatter target (integer timestamps; an empty
        # frame is trivially contiguous).
        runs_ok = ts is not None or n == 0
        if not isinstance(self.event_plan, EventGatherHBMPlan):
            return self.SortedBatch(batch, prio, None, runs_ok)
        return self.SortedBatch(
            batch, prio, jnp.asarray(self._block_bands(np.sort(yg))), runs_ok
        )

    def _host_target_key(self, events: np.ndarray, ts):
        """(yg, sort key, inlier) for host target-sorting: clipped
        rectified row (the event kernel's banding key), with the exact
        scatter target as the secondary when ``ts`` (host-binned X-map
        time, may be None) allows the host to mirror it -- the raw X-map
        value for the projector view, raw coordinates for the camera
        view.  ``inlier`` mirrors the device's per-event inlier mask
        (ops.disparity: rect row in range, disp >= 0, time bin in the
        X-map) bit-for-bit; None when ts is None.

        The key's low bit is the scatter's exact ``ok`` mask (inlier +
        crop-window bounds + disp < PACK -- every term is integer LUT
        math the host reproduces bit-for-bit), so a stable sort leaves
        each run as [rejects..., kept in arrival order]: the run's winner
        is then its LAST kept lane and the device scatter needs only a
        neighbor compare (ops.scatter method="runs")."""
        from xmaps_tpu.config import X_OFFSET
        from xmaps_tpu.ops.scatter import PACK

        mapy = self.maps.disp_cam_mapy_i16
        xmap_h, xmap_w = self.x_map_np.shape
        # Clip the LUT indices exactly like the device path
        # (ops.disparity.rectify_events*, jnp.clip to the camera dims): a
        # malformed stream with out-of-range x/y must degrade to the same
        # masked lanes the device produces, not an IndexError (or a
        # silently different row via negative wrapping) in host staging.
        yi = np.clip(events["y"].astype(np.int64), 0, mapy.shape[0] - 1)
        xi = np.clip(events["x"].astype(np.int64), 0, mapy.shape[1] - 1)
        yr = mapy[yi, xi].astype(np.int32)
        yg = np.clip(yr, 0, xmap_h - 1)
        if ts is None:
            return yg, yg, None
        xr = self.maps.disp_cam_mapx_i16[yi, xi].astype(np.int32)
        tg = np.clip(ts, 0, xmap_w - 1)
        x_proj = self.x_map_np[yg, tg].astype(np.int32)
        disp = x_proj - xr - X_OFFSET
        # mirrors ops.disparity inlier math: rectified row in-range
        # (padding-lane validity is moot -- only real lanes are sorted),
        # non-negative disparity, time bin in the X-map
        inlier = (
            (yr >= 0)
            & (yr < xmap_h - 1)
            & (disp >= 0)
            & (ts >= 0)
            & (ts < xmap_w)
        )
        ok = inlier & (disp < PACK)
        if self.cfg.camera_perspective:
            # raw-coordinate targets; decoder coords are in-bounds by
            # construction, mirrored anyway for exactness
            ok &= (events["y"] < self.cfg.camera_height) & (
                events["x"] < self.cfg.camera_width
            )
            sec = (
                events["y"].astype(np.int64) * self.cfg.camera_width
                + events["x"]
            )
        else:
            # target pixel (y_rect, x_proj - X_OFFSET); bounds are the
            # tail plan's crop window, or the full rect frame without one
            tp = self.tail_plan
            if tp is not None and hasattr(tp, "crop_row0"):
                oy, ox, wh, ww = tp.crop_row0, tp.crop_col0, tp.H, tp.W
            else:
                oy = ox = 0
                wh, ww = self.cfg.rect_height, self.cfg.rect_width
            xt = x_proj - X_OFFSET
            ok &= (
                (yr >= oy) & (yr < oy + wh) & (xt >= ox) & (xt < ox + ww)
            )
            # X-map values are non-negative i16, so the raw value is its
            # own order key (matches the device's x_proj exactly)
            sec = x_proj.astype(np.int64)
        assert xmap_h <= (1 << 26) and int(sec.max(initial=0)) < (1 << 26)
        key = (yg.astype(np.int64) << 27) | (sec << 1) | ok
        return yg, key, inlier

    def _block_bands(
        self, yg_sorted: np.ndarray, cap: int | None = None
    ) -> np.ndarray:
        """Exact per-1024-event-block X-map row bounds for the HBM event
        kernel, padded to ``cap`` (default: the engine capacity) with the
        padding lanes' rectified row (padding events carry (0, 0)
        coordinates)."""
        from xmaps_tpu.ops.pallas_events import BLOCK

        if cap is None:
            cap = self.cfg.event_capacity
        mapy = self.maps.disp_cam_mapy_i16
        xmap_h = self.x_map_np.shape[0]
        full = np.full(cap, np.clip(int(mapy[0, 0]), 0, xmap_h - 1), np.int32)
        full[: len(yg_sorted)] = yg_sorted
        blocks = full.reshape(cap // BLOCK, BLOCK)
        lo = blocks.min(axis=1)
        hi = blocks.max(axis=1)
        return np.stack(
            [(lo // 8) * 8, hi // 8 + 1 - lo // 8], axis=1
        ).astype(np.int32)

    def compact_presort(self, events: np.ndarray, ts: np.ndarray):
        """Host target-sort hook for io.prefetch compact staging
        (HostStagingPool presort_fn): returns (order, bands).

        ``order`` stable-sorts the frame's events by (rectified row,
        scatter target) -- the staged lane index then works as the
        last-write-wins priority (stable keeps arrival order within a
        target) and the device program skips both its sorts
        (depth_frame(presort_runs=True)).  ``bands`` is the HBM plan's
        per-block bounds, or an empty (0, 2) sorted-marker for resident
        plans."""
        from xmaps_tpu.ops.pallas_events import EventGatherHBMPlan

        yg, key, _ = self._host_target_key(events, ts)
        order = np.argsort(key, kind="stable")
        if not isinstance(self.event_plan, EventGatherHBMPlan):
            return order, np.zeros((0, 2), np.int32)
        return order, self._block_bands(yg[order])

    #: static winner-batch capacities (multiples of the event kernel's
    #: 1024-event BLOCK): one compiled program per rung, smallest rung
    #: that fits the frame's winner count wins
    WINNER_LADDER = (4096, 8192, 12288, 16384, 20480, 24576, 28672)

    class WinnerBatch(tuple):
        """(batch, t_scaled, priority, bands, num_inliers) -- a
        host-compacted winner batch for depth_frame(presort_unique=True).

        ``batch`` carries ONLY each target pixel's winning event (the
        host mirrors the scatter's winner resolution exactly:
        [[tests/test_scatter_runs]] pins host ok == device keep), padded
        to the smallest WINNER_LADDER rung; ``priority`` carries the
        winners' ORIGINAL arrival indices so the packed disparity map is
        bit-identical to the full-batch path's; ``num_inliers`` is the
        host-mirrored count over the FULL frame (the compacted batch
        lost the losing inlier lanes)."""

        def __new__(cls, batch, t_scaled, priority, bands, num_inliers):
            return super().__new__(
                cls, (batch, t_scaled, priority, bands, num_inliers)
            )

    def make_winner_batch(self, events: np.ndarray):
        """Host-compacted winner batch: the scatter-winner lane of every
        target pixel, nothing else (VERDICT r3 item 3's host winner
        pre-compaction).

        The host already mirrors the device's per-event integer math
        bit-for-bit for target sorting (``_host_target_key``); the winner
        of a run is its last kept lane, so extracting winners is one
        vectorized boundary test on the sorted keys.  The device then
        runs the event kernel on ~winner-count lanes and the scatter is a
        bare unique-indices set (ops.scatter method="set") -- no device
        sort, no winner detection, ~len/capacity of the scatter work.

        Returns a :class:`WinnerBatch`; requires integer timestamps and
        no frame filter (same contract as make_sorted_batch).
        """
        from xmaps_tpu.io.prefetch import _scale_time_int_host
        from xmaps_tpu.ops.pallas_events import EventGatherHBMPlan

        if self.cfg.frame_filter != "none":
            raise ValueError(
                "winner compaction requires frame_filter == 'none' (the "
                "dedup filters define their own winners)"
            )
        cap = self.cfg.event_capacity
        n = min(len(events), cap)
        events = events[:n]
        if n and not np.issubdtype(events.dtype["t"].type, np.integer):
            raise ValueError(
                "make_winner_batch requires integer timestamps (the host "
                "winner mirror needs the exact integer time binning)"
            )
        ts = (
            _scale_time_int_host(events["t"], self.cfg.t_px_scale)
            if n
            else np.zeros(0, np.int64)
        )
        yg, key, inlier = self._host_target_key(events, ts)
        if n == 0:
            inlier = np.zeros(0, bool)
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        ok_s = (key_s & 1).astype(bool)
        if n:
            boundary = np.empty(n, bool)
            boundary[:-1] = key_s[1:] != key_s[:-1]
            boundary[-1] = True
            win = ok_s & boundary
        else:
            win = np.zeros(0, bool)
        widx = order[win]  # winners' arrival indices, in (row, target) order
        n_win = len(widx)

        w_cap = next(
            (w for w in self.WINNER_LADDER if w >= n_win and w <= cap),
            cap,
        )
        batch = EventBatch.from_arrays(
            events["x"][widx],
            events["y"][widx],
            events["t"][widx],
            events["p"][widx],
            w_cap,
        )
        ts_w = np.zeros(w_cap, np.int32)
        ts_w[:n_win] = ts[widx]
        prio = np.zeros(w_cap, np.int32)
        prio[:n_win] = widx
        bands = None
        if isinstance(self.event_plan, EventGatherHBMPlan):
            bands = jnp.asarray(self._block_bands(yg[widx], cap=w_cap))
        return self.WinnerBatch(
            batch,
            jnp.asarray(ts_w),
            jnp.asarray(prio),
            bands,
            int(inlier.sum()),
        )

    def process_frame(self, events: np.ndarray) -> FrameResult:
        """events: structured array with x/y/t/p (one projector frame)."""
        return self._frame_fn(self.make_batch(events), self.tables)

    def process_frames(self, frames: list) -> list:
        """Dispatch many independent frames as ONE device program.

        The multi-camera / offline-batch regime: frames are independent
        (SURVEY §2.3), so a group program lets XLA schedule the F frame
        pipelines back to back -- dispatch overhead amortizes and
        per-frame device time approaches the compute floor (bench.py
        measures exactly this regime).  Host staging pre-sorts each frame
        by raw y when the Pallas event path is active, so the device
        skips its banding sort; results are bit-identical to
        :meth:`process_frame` on each element.

        ``frames``: list of structured x/y/t/p arrays.  The group program
        is traced once per distinct group length and cached.

        Returns a list of FrameResult, one per input frame.
        """
        if not frames:
            return []
        presort = (
            self.event_plan is not None
            and self.cfg.frame_filter == "none"
            # float-t streams cannot be host-staged (make_sorted_batch
            # raises: int64 staging would truncate them); they flow
            # through the unsorted XLA path instead
            and all(
                np.issubdtype(ev.dtype["t"].type, np.integer)
                for ev in frames
            )
        )
        if presort:
            staged = [self.make_sorted_batch(ev) for ev in frames]
            runs = all(s.runs_ok for s in staged)
            # jit sees plain pytrees only: SortedBatch is a tuple
            # SUBCLASS (carrying the host-side runs_ok flag), which JAX
            # treats as a leaf, not a container
            staged = [tuple(s) for s in staged]
        else:
            runs = False
            staged = [
                (
                    EventBatch.from_structured(ev, self.cfg.event_capacity),
                    None,
                    None,
                )
                for ev in frames
            ]
        fn = self._group_fn(len(frames), presort, runs)
        return fn(staged, self.tables)

    def _group_fn(self, size: int, presort: bool, runs: bool = False):
        import functools

        import jax

        from xmaps_tpu.ops.frame_pipeline import depth_frame

        key = (size, presort, runs)
        cache = self.__dict__.setdefault("_group_cache", {})
        if key not in cache:

            def group(staged, tables, cfg):
                return [
                    depth_frame(
                        b,
                        tables,
                        cfg,
                        tail_plan=self.tail_plan,
                        event_plan=self.event_plan,
                        presort_priority=prio,
                        presort_bands=bands,
                        # the sort-free runs scatter requires the staged
                        # batch to satisfy the target-contiguity contract
                        # (SortedBatch.runs_ok, integer timestamps only);
                        # a row-only presort keeps the banding win but
                        # must fall back to the device-sorted scatter
                        presort_runs=runs and prio is not None,
                    )
                    for b, prio, bands in staged
                ]

            cache[key] = jax.jit(functools.partial(group, cfg=self.cfg))
        return cache[key]

    def process_frames_sharded(
        self, frames: list, mesh=None, *, pallas_interpret: bool = False
    ) -> list:
        """Dispatch many independent frames as ONE device program sharded
        over a multi-chip mesh's ``data`` axis (the multi-camera /
        multi-sequence live regime scaled across chips; the single-chip
        analog is :meth:`process_frames`).

        Each device runs the engine's full fused per-frame program (host
        target-sorted staging, runs scatter, Pallas kernels) on its shard
        of frames; frames are independent so no collectives cross the
        mesh.  Results are bit-identical to :meth:`process_frame` per
        element (tests/test_sharding.py).  The frame list is padded to a
        multiple of the mesh's data size with empty frames (their outputs
        are dropped).

        ``mesh``: a ('data', 'event') Mesh with event == 1; defaults to
        pure data-parallel over all visible devices.
        """
        import jax

        from xmaps_tpu.parallel.sharding import (
            make_group_sharded_pipeline,
            make_mesh,
            shard_staged_group,
        )

        if not frames:
            return []
        if mesh is None:
            mesh = make_mesh(jax.devices(), event=1)
        data = mesh.shape["data"]

        pad = (-len(frames)) % data
        padded = list(frames) + [frames[0][:0]] * pad
        presort = (
            self.event_plan is not None
            and self.cfg.frame_filter == "none"
            and all(
                np.issubdtype(ev.dtype["t"].type, np.integer)
                for ev in frames
            )
        )
        if presort:
            staged = [self.make_sorted_batch(ev) for ev in padded]
            mode = "runs" if all(s.runs_ok for s in staged) else "prio"
        else:
            staged = [
                (
                    EventBatch.from_structured(ev, self.cfg.event_capacity),
                    None,
                    None,
                )
                for ev in padded
            ]
            mode = "none"

        key = (
            len(padded),
            mode,
            pallas_interpret,
            tuple(mesh.shape.items()),
            tuple(d.id for d in mesh.devices.flat),
        )
        cache = self.__dict__.setdefault("_sharded_group_cache", {})
        if key not in cache:
            cache[key] = make_group_sharded_pipeline(
                self.cfg,
                self.tables,
                mesh,
                tail_plan=self.tail_plan,
                event_plan=self.event_plan,
                presort=mode,
                pallas_interpret=pallas_interpret,
            )
        batch, prio, bands = shard_staged_group(staged, mesh)
        out = cache[key](batch, prio, bands)
        return [
            jax.tree.map(lambda a: a[i], out) for i in range(len(frames))
        ]

    def process_batch_device(self, batch: EventBatch) -> FrameResult:
        return self._frame_fn(batch, self.tables)

    def process_staged(self, staged) -> FrameResult:
        """Run the frame program on a packed io.prefetch batch (the
        streaming hot path; validity implied by the count).  Accepts a
        StagedBatch (2 words/event) or, when the pipeline is unfiltered,
        a CompactStagedBatch (1 word/event with host-binned time)."""
        from xmaps_tpu.io.prefetch import CompactStagedBatch

        if isinstance(staged, CompactStagedBatch):
            if self._staged_compact_fn is None:
                raise ValueError(
                    "compact staging requires frame_filter == 'none' and "
                    "a 32-bit-fit CompactLayout"
                )
            return self._staged_compact_fn(staged, self.tables)
        return self._staged_fn(staged, self.tables)

    def process_ring(self, packets, meta: np.ndarray) -> FrameResult:
        """Run the frame program on device-resident ring packets
        (io.prefetch.PacketRing pre-staging): ``packets`` is the list of
        RingPackets covering the frame, ``meta`` the (3, k) placement
        array from PacketRing.frame_meta.  Only ``meta`` crosses the
        host->device link at dispatch time.

        The program is specialized to the frame's actual packet count k
        (jit caches one executable per distinct k): half the buffer
        handles and a ~k/8 narrower per-lane slot select versus padding
        to RING_SLOTS_PER_FRAME.  Frames span 4-5 packets in steady state
        (4 packets/frame + boundary), so only a handful of variants ever
        compile, and the persistent compile cache makes them one-time."""
        from xmaps_tpu.io.prefetch import RING_SLOTS_PER_FRAME as K

        k = len(packets)
        assert 0 < k <= K and meta.shape == (3, k), (k, meta.shape)
        if packets[0].tp is None:
            # compact one-word packets (PacketRing built with RingLayout)
            assert self._ring_compact_fn is not None
            ws = tuple(p.xy for p in packets)
            return self._ring_compact_fn(ws, meta, self.tables)
        xys = tuple(p.xy for p in packets)
        tps = tuple(p.tp for p in packets)
        return self._ring_fn(xys, tps, meta, self.tables)

    def dump_frame_csv(self, events: np.ndarray, csv_path: str) -> int:
        """Write one frame's per-event debug CSV: raw coords, rectified
        coords and disparity for every inlier (the reference's debug dump,
        depth_reprojection_pipe.py:19-34).  Returns the inlier count.

        Runs the per-event stage only (no scatter/tail) and fetches to
        host; intended for offline inspection, not the hot path.
        """
        import csv

        from xmaps_tpu.ops.disparity import compute_event_disparity

        batch = self.make_batch(events)
        res = compute_event_disparity(
            batch,
            self.tables.cam_mapx_i16,
            self.tables.cam_mapy_i16,
            self.tables.x_map,
            t_px_scale=self.cfg.t_px_scale,
        )
        keep = np.asarray(res.inlier)
        xr = np.asarray(res.x_rect)[keep]
        yr = np.asarray(res.y_rect)[keep]
        disp = np.asarray(res.disp)[keep]
        x = np.asarray(batch.x)[keep]
        y = np.asarray(batch.y)[keep]
        t = np.asarray(batch.t)[keep]
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["x", "y", "t", "x_r", "y_r", "disp"])
            w.writerows(zip(x, y, t, xr, yr, disp))
        return int(keep.sum())

    @property
    def frame_fn(self):
        """The underlying jitted (batch, tables) -> FrameResult function."""
        return self._frame_fn

    def set_frame_filter(self, name: str):
        """Swap the frame dedup filter (recompiles once per new filter)."""
        self.cfg = self.cfg.replace(frame_filter=name)
        self.__dict__.pop("_group_cache", None)
        self._build_frame_fns()
