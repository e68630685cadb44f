"""Soft real-time watchdog: detect processing lag and request frame drops.

Compares wall-clock elapsed against event-time elapsed since the first
processed event (reference: timing_watchdog.py:17-33); when processing
falls a full frame behind, the pipeline drops one frame of events
(disable with --no-frame-dropping).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from xmaps_tpu.utils.stats import StatsPrinter


@dataclass
class TimingWatchdog:
    stats_printer: StatsPrinter
    projector_fps: int

    _first_event_time_us: int = -1

    def is_processing_behind(self, evs) -> bool:
        if len(evs) == 0:
            return False
        if self._first_event_time_us == -1:
            self._first_event_time_us = int(evs["t"][0])
            # first events arriving: restart the global clock
            self.stats_printer.reset()
            return False

        total_ev_time_ns = (int(evs["t"][0]) - self._first_event_time_us) * 1000
        total_processing_ns = (
            time.perf_counter_ns() - self.stats_printer.start_time_ns()
        )
        lag_ns = total_processing_ns - total_ev_time_ns
        self.stats_printer.add_time_measure_ns("(cpu t - ev[0] t)", lag_ns)

        frames_behind = int(lag_ns / (1e9 / self.projector_fps))
        self.stats_printer.add_metric("frames behind", frames_behind)
        return frames_behind > 0

    def reset(self):
        self._first_event_time_us = -1
