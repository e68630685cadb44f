"""Streaming orchestration: frame segmentation, timing, session lifecycle."""

from xmaps_tpu.runtime.trigger_finder import RobustTriggerFinder  # noqa: F401
from xmaps_tpu.runtime.watchdog import TimingWatchdog  # noqa: F401
from xmaps_tpu.runtime.pipe import DepthReprojectionPipe  # noqa: F401
from xmaps_tpu.runtime.processor import (  # noqa: F401
    DepthReprojectionProcessor,
    FakeWindow,
)
