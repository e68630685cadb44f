"""Cold-start attribution (VERDICT r4 item 4): where do the first ~200 s go?

BENCH_r04 recorded setup_first_s 196-232 s against a warm steady state of
2-3 s, attributed to "tunnel H2D stall" without evidence.  This script
fences every step of the exact bench.py setup sequence with wall clocks
and prints ONE JSON line (tee to SETUP_r05.json):

  - backend init (jax.devices)
  - tunnel warmup: first tiny put / first 32 MB put / first Mosaic program
  - engine build #1 and #2, each decomposed by from_calibration's own
    step marks (host calib math, X-map build/load, DeviceTables H2D,
    Pallas plan builds, jit wrapping)
  - first single-frame program: compile (AOT lower+compile, persistent
    cache in play) vs execute
  - first 12-frame group program: compile vs execute

Run with XMAPS_SETUP_COLD=1 to delete the JAX persistent compile cache
and the X-map/tail-plan caches first (a true cold machine); default
measures the deployed warm-cache path the driver sees.
"""

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from xmaps_tpu.utils.jaxenv import respect_jax_platforms

    respect_jax_platforms()

    cache_dir = os.path.expanduser("~/.cache/xmaps_tpu")
    jax_cache = os.path.join(cache_dir, "jax_cache")
    cold = os.environ.get("XMAPS_SETUP_COLD") == "1"
    if cold:
        shutil.rmtree(cache_dir, ignore_errors=True)
    os.makedirs(jax_cache, exist_ok=True)

    out = {"metric": "setup_breakdown_s", "cold_caches": cold}

    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", jax_cache)
    out["import_jax_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    dev = jax.devices()[0]
    out["backend_init_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(np.zeros(8, np.float32), dev) + 1)
    out["first_tiny_put_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(np.zeros(32 << 20, np.uint8), dev))
    out["first_32mb_put_s"] = round(time.perf_counter() - t0, 3)

    # first DEVICE->HOST fetch: a distinct tunnel path the H2D warmups
    # never exercise -- SETUP_r05 attributed a 216 s stall to the
    # session's first D2H (the event-plan builder's np.asarray of a
    # device LUT, since removed; this fence absorbs + measures the
    # environment cost explicitly)
    buf = jax.device_put(np.zeros(1 << 20, np.uint8), dev)
    t0 = time.perf_counter()
    np.asarray(buf)
    out["first_1mb_get_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _noop(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1

        jax.block_until_ready(
            pl.pallas_call(
                _noop,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(jnp.zeros((8, 128), jnp.int32))
        )
    except Exception:
        pass
    out["first_mosaic_program_s"] = round(time.perf_counter() - t0, 3)

    from xmaps_tpu.models.depth_pipeline import XMapsDepthEngine
    from xmaps_tpu.utils.synthetic import (
        make_synthetic_calibration,
        simulate_plane_events,
    )

    calib = make_synthetic_calibration(
        camera_width=640, camera_height=480,
        projector_width=720, projector_height=1280,
    )

    for build in (1, 2):
        t0 = time.perf_counter()
        engine = XMapsDepthEngine.from_calibration(
            calib, event_capacity=28 * 1024, z_near=0.2, z_far=1.2,
            xmap_cache_dir=cache_dir,
        )
        out[f"engine_build{build}_s"] = round(time.perf_counter() - t0, 3)
        out[f"engine_build{build}_steps"] = {
            label: round(dt, 3) for label, dt in engine.setup_timings
        }

    rng = np.random.default_rng(5)
    evs = simulate_plane_events(
        calib, depth_m=0.5, subsample=0.031, jitter_us=2.0, rng=rng
    )

    # single-frame program: compile vs execute (first call = compile +
    # run; second call = run; their difference isolates compile, which
    # with the persistent cache is mostly cache lookup + deserialize)
    t0 = time.perf_counter()
    res = engine.process_frame(evs)
    int(res.num_inliers)
    out["first_frame_compile_plus_run_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    res = engine.process_frame(evs)
    int(res.num_inliers)
    out["frame_run_s"] = round(time.perf_counter() - t0, 3)

    # the 12-frame group program (what bench.py times)
    frames = [
        simulate_plane_events(
            calib, depth_m=0.45 + 0.02 * i, subsample=0.031,
            jitter_us=2.0, rng=rng,
        )
        for i in range(12)
    ]
    t0 = time.perf_counter()
    outs = engine.process_frames(frames)
    int(outs[-1].num_inliers)
    out["first_group12_compile_plus_run_s"] = round(
        time.perf_counter() - t0, 3
    )
    t0 = time.perf_counter()
    outs = engine.process_frames(frames)
    int(outs[-1].num_inliers)
    out["group12_run_s"] = round(time.perf_counter() - t0, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
