"""Multi-chip weak-scaling measurement on the virtual 8-device CPU mesh.

Real multi-chip hardware is not reachable in this environment (one
tunneled chip), so the ('data','event') mesh pipeline is measured on
XLA's virtual host devices (`--xla_force_host_platform_device_count=8`,
the same recipe as tests/conftest.py and dryrun_multichip).  That makes
this a *structural* measurement: all virtual devices share the host's
cores, so absolute times do not model ICI -- but per-frame work, the
collective pattern (pmin/pmax/psum), and the weak-scaling shape
(one frame per 'data' shard, constant per-device work) are exactly what
would run on a v5e slice, and gross inefficiencies (replicated work
growing with the mesh, collectives serializing the step) would show here.

Writes SCALING_r{N}.json given --out, else prints the JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    # A site plugin may force-register the tunneled TPU platform and
    # override jax_platforms at import time; with the tunnel down its
    # backend init hangs indefinitely.  Re-pin AFTER the import (same
    # recipe as tests/conftest.py) so only the cpu client initializes.
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from xmaps_tpu.config import PipelineConfig
    from xmaps_tpu.calib.maps import CamProjMaps
    from xmaps_tpu.models.depth_pipeline import XMapsDepthEngine
    from xmaps_tpu.ops.event_batch import EventBatch
    from xmaps_tpu.parallel import (
        make_mesh,
        make_sharded_pipeline,
        shard_batches,
    )
    from xmaps_tpu.utils.synthetic import (
        make_synthetic_calibration,
        simulate_plane_events,
    )

    devices = jax.devices("cpu")
    assert len(devices) >= 8, f"need 8 virtual devices, have {len(devices)}"

    calib = make_synthetic_calibration(
        camera_width=320, camera_height=240,
        projector_width=360, projector_height=640,
    )
    engine = XMapsDepthEngine.from_calibration(
        calib,
        event_capacity=8192,
        z_near=0.2,
        z_far=1.2,
        use_pallas_tail=False,
        use_pallas_events=False,
    )
    cfg, tables = engine.cfg, engine.tables

    rng = np.random.default_rng(9)
    frames = [
        EventBatch.from_structured(
            simulate_plane_events(
                calib, depth_m=0.4 + 0.03 * i, subsample=0.25, rng=rng
            ),
            cfg.event_capacity,
        )
        for i in range(8)
    ]

    shapes = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2), (2, 4), (1, 8)]
    results = {}
    for data, event in shapes:
        mesh = make_mesh(devices[: data * event], data=data, event=event)
        pipeline = make_sharded_pipeline(cfg, tables, mesh)
        stacked = shard_batches(frames[:data], mesh, cfg)
        out = pipeline(stacked)  # compile + warmup
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = pipeline(stacked)
            # block every step: queueing several 8-participant collective
            # runs on one shared core can starve XLA's 40 s rendezvous
            # (observed as a hard abort); per-step sync costs ~nothing at
            # these step times and keeps the measurement well-defined
            jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        step_ms = dt / args.steps * 1e3
        results[f"{data}x{event}"] = {
            "frames_per_step": data,
            "step_ms": round(step_ms, 3),
            "frame_ms": round(step_ms / data, 3),
        }
        inl = np.asarray(out.num_inliers)
        assert (inl > 0).all(), f"no inliers at mesh {data}x{event}"

    base = results["1x1"]["frame_ms"]
    for v in results.values():
        v["weak_scaling_eff"] = round(base / v["frame_ms"], 3)

    # LIVE group path: the engine's host-staged per-frame programs (target
    # -sorted staging + runs scatter) data-parallel over the mesh -- the
    # multi-sequence streaming regime as ONE program (the moral
    # equivalent of the reference's GNU-parallel fan-out).  Bit-exactness
    # vs process_frame is pinned by tests/test_sharding.py; this records
    # the same structural weak-scaling row for it.
    from xmaps_tpu.ops.pallas_events import build_event_gather_plan

    engine.event_plan = build_event_gather_plan(
        engine.tables.cam_map_packed, engine.x_map_np
    )
    raw_frames = [
        simulate_plane_events(
            calib, depth_m=0.4 + 0.03 * i, subsample=0.25,
            rng=np.random.default_rng(100 + i),
        )
        for i in range(8)
    ]
    group_live = {}
    for data in (1, 2, 4, 8):
        mesh = make_mesh(devices[:data], data=data, event=1)
        out = engine.process_frames_sharded(
            raw_frames[:data], mesh, pallas_interpret=True
        )  # compile + warmup (staging redone per call, like live use)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = engine.process_frames_sharded(
                raw_frames[:data], mesh, pallas_interpret=True
            )
        jax.block_until_ready(out)
        step_ms = (time.perf_counter() - t0) / args.steps * 1e3
        group_live[f"{data}x1"] = {
            "frames_per_step": data,
            "step_ms": round(step_ms, 3),
            "frame_ms": round(step_ms / data, 3),
        }
        assert all(int(o.num_inliers) > 0 for o in out)
    gbase = group_live["1x1"]["frame_ms"]
    for v in group_live.values():
        v["weak_scaling_eff"] = round(gbase / v["frame_ms"], 3)

    doc = {
        "metric": "weak_scaling_virtual_8dev_cpu",
        "mesh_axes": ["data (frames)", "event (within-frame)"],
        "results": results,
        "group_live_path": {
            "what": "engine.process_frames_sharded: host target-sorted "
            "staging + runs scatter + fused per-frame program, data-"
            "parallel as ONE shard_map program incl. host re-staging per "
            "step (the live multi-sequence regime; bit-exact vs "
            "process_frame per tests/test_sharding.py)",
            "results": group_live,
        },
        "events_per_frame": int(frames[0].count),
        "collectives": "pmin/pmax frame-time scalars + pmax packed "
        "disparity image + psum inlier count (event axis only)",
        "host_cores": os.cpu_count(),
        "note": "virtual XLA host devices share the host's cores (ONE "
        "in this environment), so all devices serialize and absolute "
        "times carry no parallel-speedup information. What this "
        "validates structurally: per-frame work stays constant along "
        "'data' (frame_ms flat as the mesh grows => no replicated "
        "per-frame compute creeps in), and the event-axis collective "
        "pattern compiles and runs at every shape. Event-sharded shapes "
        "inflate because the dense image tail is deliberately "
        "replicated across the event axis (sharding.py design note) -- "
        "concurrent on real chips, serialized on shared cores. Absolute "
        "ICI numbers require a real multi-chip slice (unavailable "
        "here).",
    }
    line = json.dumps(doc)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
