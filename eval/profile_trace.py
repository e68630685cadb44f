"""Capture a jax.profiler device trace of the 24-frame group program and
print per-op durations aggregated from the perfetto trace events."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from xmaps_tpu.utils.jaxenv import respect_jax_platforms

    respect_jax_platforms()  # honor an explicit JAX_PLATFORMS (e.g. cpu)
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", choices=["demo", "esl"], default="demo")
    ap.add_argument("--display-only", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/xmaps_tpu/jax_cache"),
    )
    from xmaps_tpu.models.depth_pipeline import XMapsDepthEngine
    from xmaps_tpu.ops.event_batch import EventBatch
    from xmaps_tpu.ops.frame_pipeline import depth_frame
    from xmaps_tpu.utils.synthetic import (
        make_synthetic_calibration,
        simulate_plane_events,
    )

    dev = jax.devices()[0]
    jax.block_until_ready(jax.device_put(np.zeros(8, np.float32), dev) + 1)
    jax.block_until_ready(jax.device_put(np.zeros(32 << 20, np.uint8), dev))

    if args.geometry == "esl":
        # the paper's eval rig (see eval/bench_geometry.py)
        import dataclasses

        calib = make_synthetic_calibration(
            camera_width=640, camera_height=480,
            projector_width=1080, projector_height=1920,
        )
        calib = dataclasses.replace(
            calib, rect_image_width=3 * 1080, rect_image_height=3 * 1920
        )
    else:
        calib = make_synthetic_calibration(
            camera_width=640, camera_height=480,
            projector_width=720, projector_height=1280,
        )
    engine = XMapsDepthEngine.from_calibration(
        calib, event_capacity=28 * 1024, z_near=0.2, z_far=1.2,
        xmap_cache_dir=os.path.expanduser("~/.cache/xmaps_tpu"),
    )
    cfg, tables, ep, tp = (
        engine.cfg, engine.tables, engine.event_plan, engine.tail_plan
    )
    rng = np.random.default_rng(7)
    frames = []
    n_group = 12 if args.geometry == "esl" else 24
    for i in range(n_group):
        ev = simulate_plane_events(
            calib, depth_m=0.45 + 0.02 * i, subsample=0.031,
            jitter_us=2.0, rng=rng,
        )
        if len(ev) > cfg.event_capacity - 1024:
            keep = np.sort(rng.choice(
                len(ev), size=cfg.event_capacity - 1024, replace=False
            ))
            ev = ev[keep]
        frames.append(engine.make_sorted_batch(ev))
    runs_ok = all(b.runs_ok for b in frames)
    frames = [jax.device_put(tuple(b), dev) for b in frames]
    disp_only = bool(args.display_only)

    @jax.jit
    def run_group(bs):
        return [
            depth_frame(
                b, tables, cfg, tail_plan=tp, event_plan=ep,
                presort_priority=prio, presort_bands=bands,
                presort_runs=runs_ok and prio is not None,
                display_only=disp_only,
            )
            for b, prio, bands in bs
        ]

    out = run_group(frames)
    jax.block_until_ready(out)
    int(out[-1].num_inliers)

    trace_dir = "/tmp/xmaps_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = run_group(frames)
            jax.block_until_ready(out)
        int(out[-1].num_inliers)

    # find the trace json
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace written under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    # device-side complete events: aggregate duration by name
    agg = defaultdict(float)
    cnt = defaultdict(int)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()
    }
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid = ev.get("pid")
        if device_pids and pid not in device_pids:
            continue
        name = ev.get("name", "")
        agg[name] += ev.get("dur", 0.0)
        cnt[name] += 1
    total = sum(agg.values())
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    print(f"# pids: {pid_names}")
    print(f"# total traced us (3 groups): {total:.0f}")
    for name, dur in rows:
        per_frame = dur / (3 * n_group)
        print(f"{per_frame:9.1f} us/frame  x{cnt[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
