"""Live/replay depth estimation CLI.

Flag-compatible with the reference entry point
(depth_reprojection.py:32-61), plus TPU-host options for the display sink.

    python -m xmaps_tpu.apps.depth_reprojection \
        --calib data/calib.yaml --input recording.raw \
        --projector-width 720 --projector-height 1280
"""

from __future__ import annotations

import sys

import click

from xmaps_tpu.config import EV_PACKETS_PER_FRAME, RuntimeParams
from xmaps_tpu.io.event_iterator import FileEventsIterator
from xmaps_tpu.runtime.processor import DepthReprojectionProcessor


def project_events(bias, input, params, delta_t, ev_processor):
    """Replay loop: pull delta_t packets through the processor
    (reference: depth_reprojection.py:10-29)."""
    mv_iterator = FileEventsIterator(
        input_filename=input, delta_t=delta_t, bias_file=bias
    )
    cam_height_reader, cam_width_reader = mv_iterator.get_size()

    assert cam_height_reader == params.camera_height, (
        f"stream geometry {cam_height_reader} != {params.camera_height}"
    )
    assert cam_width_reader == params.camera_width

    for evs in mv_iterator:
        with ev_processor.stats_printer.measure_time("main loop"):
            if not len(evs):
                continue
            ev_processor.process_events(evs)
            if ev_processor.should_close():
                sys.exit(0)


@click.command()
@click.option("--projector-width", default=720, help="Projector width in pixels", type=int)
@click.option("--projector-height", default=1280, help="Projector height in pixels", type=int)
@click.option("--projector-fps", default=60, help="Projector fps", type=int)
@click.option(
    "--projector-time-map",
    help="Path to calibrated projector time map file (*.npy). If left empty, "
    "a linear time map will be used.",
    type=click.Path(),
)
@click.option("--z-near", default=0.1, help="Minimum depth [m] for visualization", type=float)
@click.option("--z-far", default=1.0, help="Maximum depth [m] for visualization", type=float)
@click.option(
    "--calib",
    help="path to yaml file with camera and projector intrinsic and extrinsic calibration",
    type=click.Path(exists=True),
    required=True,
)
@click.option("--bias", help="Path to bias file, only required for live camera", type=click.Path())
@click.option(
    "--input",
    help="A .raw, .dat or .npy file with prerecorded events.",
    type=click.Path(exists=True),
    required=True,
)
@click.option("--loop-input", help="Loop input file", is_flag=True)
@click.option(
    "--no-frame-dropping",
    help="Process all events, even when processing lags behind the event stream",
    is_flag=True,
)
@click.option(
    "--camera-perspective",
    help="By default the depth is rendered from the projector's perspective. "
    "Enable this flag to render from the camera perspective instead.",
    is_flag=True,
)
@click.option(
    "--window",
    default="none",
    type=click.Choice(["none", "files", "cv2"]),
    help="Display sink: none (headless), files (PNG dumps), cv2 (GUI window).",
)
@click.option("--out-dir", default="frames_out", help="Directory for --window files")
@click.option("--camera-width", default=640, type=int)
@click.option("--camera-height", default=480, type=int)
@click.option(
    "--profile-dir",
    default=None,
    type=click.Path(),
    help="Capture a jax.profiler device trace of the replay into this "
    "directory (view with TensorBoard / xprof)",
)
def main(bias, input, loop_input, window, out_dir, profile_dir, **cli_params):
    params = RuntimeParams(**cli_params)

    delta_t = 1e6 / params.projector_fps / EV_PACKETS_PER_FRAME
    print(
        f"Using delta_t={delta_t:.2f} us to process "
        f"{EV_PACKETS_PER_FRAME} ev packets per projector frame."
    )

    import contextlib

    if profile_dir is not None:
        import jax

        trace_cm = jax.profiler.trace(profile_dir)
    else:
        trace_cm = contextlib.nullcontext()

    with DepthReprojectionProcessor(
        params=params, window_kind=window, out_dir=out_dir
    ) as ev_processor, trace_cm:
        while True:
            project_events(bias, input, params, delta_t, ev_processor)
            if loop_input:
                ev_processor.reset()
            else:
                break


if __name__ == "__main__":
    main()
