"""Fixed-capacity SoA event batches (the device-side event representation).

The reference streams variable-length structured arrays
``{x:u16, y:u16, p:i16, t:i64}`` (Metavision EventCD).  XLA requires static
shapes, so frames are carried as fixed-capacity padded batches with a
validity count; every downstream op masks by validity.  Timestamps are
stored as int32 microseconds relative to the batch's ``t_base`` (a frame
spans ~16.7 ms, so 32 bits are ample) -- this keeps the hot path off
emulated 64-bit arithmetic on TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class EventBatch(NamedTuple):
    """One padded frame (or packet) of events, SoA layout.

    Attributes:
        x, y: pixel coordinates, int32, shape (capacity,).
        t: microseconds relative to ``t_base``, int32, shape (capacity,).
           For the offline ESL eval path, t may instead be float32 in [0, 1]
           (normalized time surface intensities, see
           reference eval/compute_depth_x_maps.py:82-96).
        p: polarity 0/1, int32, shape (capacity,).
        valid: bool mask, shape (capacity,).
        count: number of valid events, int32 scalar.
    """

    x: jax.Array
    y: jax.Array
    t: jax.Array
    p: jax.Array
    valid: jax.Array
    count: jax.Array

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]

    @staticmethod
    def from_arrays(
        x: np.ndarray,
        y: np.ndarray,
        t: np.ndarray,
        p: np.ndarray,
        capacity: int,
        t_dtype=jnp.int32,
    ) -> "EventBatch":
        """Pad/truncate host arrays into a fixed-capacity batch.

        Absolute int64 timestamps are rebased to t[0] before narrowing to
        int32.
        """
        n = min(len(x), capacity)
        if len(x) > capacity:
            x, y, t, p = x[:capacity], y[:capacity], t[:capacity], p[:capacity]

        def pad(a, dtype):
            out = np.zeros(capacity, dtype=dtype)
            out[:n] = a[:n]
            return out

        if np.issubdtype(np.asarray(t).dtype, np.integer):
            t_rel = np.asarray(t, dtype=np.int64)
            if n:
                t_rel = t_rel - t_rel[0]
            t_arr = pad(t_rel, np.int32 if t_dtype == jnp.int32 else np.float32)
        else:
            t_arr = pad(np.asarray(t, dtype=np.float32), np.float32)

        valid = np.zeros(capacity, dtype=bool)
        valid[:n] = True
        return EventBatch(
            x=jnp.asarray(pad(x, np.int32)),
            y=jnp.asarray(pad(y, np.int32)),
            t=jnp.asarray(t_arr),
            p=jnp.asarray(pad(p, np.int32)),
            valid=jnp.asarray(valid),
            count=jnp.asarray(n, dtype=jnp.int32),
        )

    @staticmethod
    def from_structured(evs: np.ndarray, capacity: int) -> "EventBatch":
        """Build from a Metavision-style structured array with x/y/t/p."""
        return EventBatch.from_arrays(
            evs["x"], evs["y"], evs["t"], evs["p"], capacity
        )
