"""Pipeline wiring: packets -> filters -> trigger finder -> device frame.

The orchestration equivalent of the reference DepthReprojectionPipe
(depth_reprojection_pipe.py:38-176).  Per-packet path: watchdog -> fused
polarity+activity filter (native C++) -> trigger finder.  Per-frame path:
ONE fused device program (xmaps_tpu.ops.frame_pipeline) replacing the
reference's rectify / filter / disparity / scatter / dilate / remap /
colorize stage chain, plus an async handoff of the finished frame to the
display callback.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

import jax

from xmaps_tpu.config import RuntimeParams
from xmaps_tpu.io.filters import ActivityNoiseFilter
from xmaps_tpu.io.prefetch import HostStagingPool
from xmaps_tpu.models.depth_pipeline import XMapsDepthEngine
from xmaps_tpu.ops.filters import FILTER_NAMES
from xmaps_tpu.runtime.trigger_finder import RobustTriggerFinder
from xmaps_tpu.runtime.watchdog import TimingWatchdog
from xmaps_tpu.utils.stats import SingleTimer, StatsPrinter


@dataclass
class DepthReprojectionPipe:
    params: RuntimeParams
    stats_printer: StatsPrinter
    frame_callback: Callable[[np.ndarray], None]

    engine: Optional[XMapsDepthEngine] = None

    #: True = flush each frame synchronously (lowest latency); False =
    #: keep one frame in flight so device compute overlaps segmentation
    #: (highest throughput, plus ~1 frame of display delay).
    low_latency: bool = False

    trigger_finder: RobustTriggerFinder = field(init=False)
    watchdog: TimingWatchdog = field(init=False)
    act_filter: ActivityNoiseFilter = field(init=False)

    _filter_idx: int = 0
    _pending: Optional[object] = None  # in-flight device FrameResult

    def __post_init__(self):
        p = self.params
        self.act_filter = ActivityNoiseFilter(
            p.camera_width,
            p.camera_height,
            window_us=int(1e6 / p.projector_fps),
            keep_polarity=1,
        )

        if self.engine is None:
            with SingleTimer("Setting up calibration, maps and X-map"):
                self.engine = XMapsDepthEngine.from_runtime_params(p)

        self.staging = HostStagingPool(
            self.engine.cfg.event_capacity,
            depth=2,
            layout=self.engine.compact_layout,
        )

        self.trigger_finder = RobustTriggerFinder(
            projector_fps=p.projector_fps,
            stats=self.stats_printer,
            frame_callback=self.process_ev_frame,
        )
        self.watchdog = TimingWatchdog(
            stats_printer=self.stats_printer, projector_fps=p.projector_fps
        )

    # -- per packet -------------------------------------------------------

    def process_events(self, evs: np.ndarray):
        if (
            self.watchdog.is_processing_behind(evs)
            and self.params.should_drop_frames
        ):
            self.trigger_finder.drop_frame()

        with self.stats_printer.measure_time("act+pol filter"):
            evs = self.act_filter.process(evs)

        self.trigger_finder.process_events(evs)

    # -- per frame ---------------------------------------------------------

    def process_ev_frame(self, evs: np.ndarray):
        """Trigger-finder callback: one frame of events -> device program.

        The previous frame's device result is collected first, so device
        compute overlaps with the next frame's host-side segmentation
        (double buffering; the EventBatch staging alternates buffers).
        """
        self._flush_pending()

        with self.stats_printer.measure_time("stage batch"):
            # reused host buffers, packed words, async H2D (io.prefetch);
            # the copy overlaps host-side segmentation.  Unfiltered
            # pipelines ship ONE word/event (host-binned time); dedup
            # filters need raw timestamps, so they use the 2-word form.
            if (
                self.engine.compact_layout is not None
                and self.engine.cfg.frame_filter == "none"
            ):
                batch = self.staging.stage_compact(evs)
            else:
                batch = self.staging.stage(evs)
        with self.stats_printer.measure_time("dispatch frame"):
            result = self.engine.process_staged(batch)
        self._pending = result
        self.stats_printer.count("frames dispatched")
        if self.low_latency:
            self._flush_pending()

    def _flush_pending(self):
        if self._pending is None:
            return
        with self.stats_printer.measure_time("fetch frame"):
            frame = np.asarray(jax.device_get(self._pending.frame_bgr))
            self.stats_printer.add_metric(
                "frame inliers", int(self._pending.num_inliers)
            )
        self._pending = None
        self.frame_callback(frame)

    def flush(self):
        """Drain the in-flight frame (call at end of stream)."""
        self._flush_pending()

    # -- runtime controls ---------------------------------------------------

    def select_next_frame_event_filter(self) -> str:
        """Cycle the frame dedup filter (reference E key,
        depth_reprojection_pipe.py:169-171).  Recompiles on first use of a
        new filter (cached afterwards)."""
        self._filter_idx = (self._filter_idx + 1) % len(FILTER_NAMES)
        name = FILTER_NAMES[self._filter_idx]
        self.engine.set_frame_filter(name)
        self.stats_printer.log(f"Selected event filter: {name}")
        return name

    def reset(self):
        self.flush()
        self.watchdog.reset()
        self.trigger_finder.reset()
        self.act_filter.reset()
