"""Double-buffered host->HBM staging of event batches.

The reference recycles native event buffers through a free list
(event_buf_pool.py:10-17) so the per-packet hot path never allocates.
The TPU equivalent staged here:

- ``HostStagingPool`` owns ``depth`` preallocated SoA host buffer sets
  (x/y/t/p/valid at the pipeline's fixed capacity) and fills them in
  place per frame -- no host allocation per frame;
- each ``stage`` call issues one async ``jax.device_put`` of the whole
  batch, so the host->HBM copy of frame N+1 overlaps the device compute
  of frame N (the pipe keeps one frame in flight, runtime/pipe.py);
- the slots rotate, and a slot is only rewritten after the frame that
  consumed it has been fetched back (the pipe flushes frame N's result
  before staging frame N+2), so the async transfer is never raced.

Downstream, the engine's donating frame function
(XMapsDepthEngine.process_batch_device(donate=True)) hands these device
buffers back to XLA every frame, so HBM is reused instead of reallocated.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from xmaps_tpu.ops.event_batch import EventBatch

__all__ = ["HostStagingPool"]


class HostStagingPool:
    """Rotating preallocated host buffers for padded EventBatch staging."""

    def __init__(
        self,
        capacity: int,
        depth: int = 2,
        device: Optional[jax.Device] = None,
    ):
        assert depth >= 2, "need >= 2 slots to overlap H2D with compute"
        self.capacity = capacity
        self.device = device
        self._slots = [
            {
                "x": np.zeros(capacity, np.int32),
                "y": np.zeros(capacity, np.int32),
                "t": np.zeros(capacity, np.int32),
                "p": np.zeros(capacity, np.int32),
                "valid": np.zeros(capacity, bool),
            }
            for _ in range(depth)
        ]
        self._next = 0
        self.frames_staged = 0
        self.events_truncated = 0

    def stage(self, evs: np.ndarray) -> EventBatch:
        """Fill the next host slot in place and start the async H2D copy.

        Semantics match EventBatch.from_structured (rebased int32
        timestamps, zero padding, truncation at capacity).
        """
        slot = self._slots[self._next]
        self._next = (self._next + 1) % len(self._slots)

        cap = self.capacity
        n = min(len(evs), cap)
        if len(evs) > cap:
            self.events_truncated += len(evs) - cap

        for name in ("x", "y", "p"):
            buf = slot[name]
            buf[:n] = evs[name][:n]
            buf[n:] = 0

        t = slot["t"]
        if n:
            t64 = evs["t"][:n].astype(np.int64, copy=False)
            np.subtract(t64, t64[0], out=t[:n], casting="unsafe")
        t[n:] = 0

        valid = slot["valid"]
        valid[:n] = True
        valid[n:] = False

        self.frames_staged += 1
        x_d, y_d, t_d, p_d, v_d = jax.device_put(
            (slot["x"], slot["y"], t, slot["p"], valid), self.device
        )
        return EventBatch(
            x=x_d,
            y=y_d,
            t=t_d,
            p=p_d,
            valid=v_d,
            count=jnp.asarray(np.int32(n)),
        )
