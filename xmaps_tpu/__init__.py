"""xmaps-tpu: a TPU-native event-camera structured-light depth framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of fraunhoferhhi/X-maps
(CVPRW 2023): real-time depth from an event camera observing a scanning laser
projector.  An event's rectified y-coordinate and its normalized timestamp
within the projector frame index a precomputed "X-map" that yields the
projector column that illuminated it; disparity and depth follow directly.

Layer map (mirrors reference layers, see SURVEY.md):

- ``xmaps_tpu.calib``    -- one-time host-side calibration math (NumPy):
  OpenCV-compatible stereo rectification, distortion models, LUT builders.
- ``xmaps_tpu.ops``      -- device compute (JAX/XLA/Pallas): per-event
  rectify/lookup/scatter, dense image tail, X-map construction.
- ``xmaps_tpu.models``   -- the flagship end-to-end depth pipeline module.
- ``xmaps_tpu.parallel`` -- jax.sharding meshes for multi-chip scale-out.
- ``xmaps_tpu.io``       -- host-side event IO: EVT2/EVT3/DAT decoding,
  packet iterators, double-buffered device feed.
- ``xmaps_tpu.runtime``  -- streaming orchestration: trigger finder, timing
  watchdog, processor session.
- ``xmaps_tpu.utils``    -- stats/observability, colormaps, PLY export.
- ``xmaps_tpu.apps``     -- CLI entry points (live/replay app, offline eval).
"""

__version__ = "0.1.0"

from xmaps_tpu.config import RuntimeParams, PipelineConfig  # noqa: F401
