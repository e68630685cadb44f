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
    ap.add_argument(
        "--display-only", action="store_true",
        help="display surface but UNPACKED BGR (the pre-round-4 surface)",
    )
    ap.add_argument(
        "--full", action="store_true",
        help="trace the full FrameResult surface (depth/disparity/BGR "
        "outputs + their layout copies) instead of the streaming surface",
    )
    ap.add_argument(
        "--frames", type=int, default=0,
        help="group size override (default: 24 demo / 12 esl); smaller "
        "groups compile much faster at the ESL geometry",
    )
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
    n_group = args.frames or (12 if args.geometry == "esl" else 24)
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
    # Default: the STREAMING display surface (display_only + packed-BGR),
    # i.e. exactly what runtime/pipe.py and the benches execute per frame.
    # --full instead returns the whole FrameResult (depth + disparity +
    # unpacked BGR) and pays XLA output-layout materialization copies
    # (~52 us/frame at the ESL geometry) that the live path never runs.
    disp_only = not args.full
    packed = not args.full and not args.display_only

    import functools

    from xmaps_tpu.models.depth_pipeline import display_out_shardings

    disp_fmt = display_out_shardings() if packed else None
    group_kw = (
        {} if disp_fmt is None
        else {"out_shardings": [disp_fmt] * len(frames)}
    )

    @functools.partial(jax.jit, **group_kw)
    def run_group(bs):
        return [
            depth_frame(
                b, tables, cfg, tail_plan=tp, event_plan=ep,
                # CPU smoke runs have no Pallas event plan; the presort
                # extras are only legal when the plan consumes them
                presort_priority=prio if ep is not None else None,
                presort_bands=bands if ep is not None else None,
                presort_runs=ep is not None and runs_ok and prio is not None,
                display_only=disp_only, display_packed=packed,
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

    # Aggregate device ops into a per-frame stage budget.  Per-frame op
    # instances carry .N suffixes (fusion.2, run_group.33, ...): strip
    # them so the 12/24 copies of each frame's op aggregate together,
    # then bucket into the three kernels vs everything else.
    import re

    pid_names = {}
    tid_names = defaultdict(dict)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
        elif ev.get("name") == "thread_name":
            tid_names[ev["pid"]][ev["tid"]] = ev.get("args", {}).get(
                "name", ""
            )
    device_pids = {p for p, n in pid_names.items() if "TPU" in n}
    if not device_pids:  # CPU fallback (smoke runs)
        device_pids = {
            p for p, n in pid_names.items() if "/device" in n.lower()
        }

    runs = 3
    frames = runs * n_group
    buckets = defaultdict(float)
    by_base = defaultdict(float)
    base_cnt = defaultdict(int)
    bucket_cnt = defaultdict(int)
    sig_cnt = defaultdict(int)  # instances above SIG_US only
    pair_cnt = defaultdict(int)  # (base, bucket) -> instances
    pair_us = defaultdict(float)
    long_by_pair = {}
    module_us = 0.0
    # Count-validation threshold: the three kernels run 50-145 us each;
    # sub-threshold matches (e.g. a one-off 0 us LUT-assembly custom-call
    # per module) must not fail the structural check, but they are still
    # listed in the diagnostics and included in the time buckets.
    SIG_US = 2.0
    shape_re = re.compile(r"=\s*\(?(\w+)\[([\d,]*)\]")

    def classify(base, long_name):
        # The two Pallas kernels lower to HLO custom-calls.  Their op
        # names inherit the jit function name (not "pallas"), so identify
        # them by their RESULT signature, which is structural: the event
        # kernel returns the (xr, yr, xproj) tuple of s32[cap/128, 128];
        # the tail kernel's first result is the display plane (u32 packed
        # or u8 BGR).  An explicit scatter HLO (base name "scatter...")
        # is bucketed by name; the usual case is the scatter FUSED into a
        # kLoop fusion whose large-u32 output is the packed map.
        if "custom-call(" in long_name:
            m = shape_re.search(long_name)
            if m and m.group(1) == "s32":
                return "event_kernel"
            return "tail_kernel"
        if base.startswith("scatter") or base.startswith("select-and-scatter"):
            return "scatter"
        if base.startswith("fusion") or "fusion" in base:
            m = shape_re.search(long_name)
            if m and m.group(1) == "u32":
                numel = 1
                for d in filter(None, m.group(2).split(",")):
                    numel *= int(d)
                if numel > 100_000:
                    return "scatter"
        return "other"

    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        tname = tid_names[ev["pid"]].get(ev["tid"], "")
        name = ev.get("name", "")
        dur = ev.get("dur", 0.0)
        if "Module" in tname:
            module_us += dur
            continue
        if "Ops" not in tname:
            continue  # overlays / derived rows would double-count
        base = re.sub(r"\.\d+$", "", name)
        long_name = str(ev.get("args", {}).get("long_name", ""))
        bucket = classify(base, long_name)
        buckets[bucket] += dur
        by_base[base] += dur
        base_cnt[base] += 1
        bucket_cnt[bucket] += 1
        if dur >= SIG_US:
            sig_cnt[bucket] += 1
        pair_cnt[(base, bucket)] += 1
        pair_us[(base, bucket)] += dur
        long_by_pair.setdefault((base, bucket), long_name)

    ops_total = sum(buckets.values())
    # Sanity-check the classification against the program's known
    # structure: exactly ONE event kernel and ONE tail kernel instance
    # per frame, and >= 1 scatter op -- counting SIGNIFICANT instances
    # (dur >= SIG_US) only, so a stray ~0 us custom-call per module (LUT
    # assembly etc.) doesn't fail the check while a real extra/missing
    # kernel does.  A mismatch means ops were misbucketed (e.g. an HLO
    # pattern this classifier doesn't know), so the published stage
    # budget would be skewed -- warn loudly with the per-bucket op
    # counts instead of silently printing wrong numbers.
    expect = {"event_kernel": 1.0, "tail_kernel": 1.0}
    classify_ok = True
    for k, want in expect.items():
        got = sig_cnt[k] / frames
        if abs(got - want) > 1e-6:
            classify_ok = False
            print(
                f"# WARNING: {k} matched {got:.2f} significant ops/frame "
                f"(expected {want:.0f}) -- stage budget may be "
                f"misbucketed", file=sys.stderr,
            )
    if sig_cnt["scatter"] / frames < 1.0:
        classify_ok = False
        print(
            f"# WARNING: scatter matched "
            f"{sig_cnt['scatter'] / frames:.2f} significant ops/frame "
            f"(expected >= 1) -- the packed-map scatter fusion was not "
            f"identified", file=sys.stderr,
        )
    if not classify_ok:
        # Show exactly which ops landed in the kernel buckets so a
        # misclassification can be diagnosed from the artifact alone.
        print("# kernel-bucket ops by (base name, bucket):",
              file=sys.stderr)
        for (base, bucket), cnt in sorted(pair_cnt.items()):
            if bucket in ("event_kernel", "tail_kernel", "scatter"):
                print(
                    f"#   {bucket:12s} x{cnt:4d} "
                    f"{pair_us[(base, bucket)] / frames:8.1f} us/frame  "
                    f"{base[:60]}  "
                    f"{long_by_pair.get((base, bucket), '')[:120]}",
                    file=sys.stderr,
                )
    print(f"# surface: {'full' if args.full else 'stream'}"
          f"{' (unpacked)' if args.display_only else ''}, "
          f"geometry={args.geometry}, {n_group} frames/group x {runs} runs")
    print(f"# module total: {module_us / frames:.1f} us/frame; "
          f"device ops total: {ops_total / frames:.1f} us/frame")
    for k in ("event_kernel", "scatter", "tail_kernel", "other"):
        print(f"  {k:13s} {buckets[k] / frames:9.1f} us/frame")
    print("# top ops (aggregated across per-frame instances):")
    for base, dur in sorted(by_base.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{dur / frames:9.1f} us/frame  x{base_cnt[base]:5d}  "
              f"{base[:90]}")
    summary = {
        "metric": "device_stage_budget_us_per_frame",
        "geometry": args.geometry,
        "surface": "full" if args.full else "stream",
        "event_kernel_us": round(buckets["event_kernel"] / frames, 1),
        "scatter_us": round(buckets["scatter"] / frames, 1),
        "tail_kernel_us": round(buckets["tail_kernel"] / frames, 1),
        "outside_kernels_us": round(buckets["other"] / frames, 1),
        "device_ops_total_us": round(ops_total / frames, 1),
        "module_total_us": round(module_us / frames, 1),
        "classification_ok": classify_ok,
        "ops_per_frame": {
            k: round(bucket_cnt[k] / frames, 2)
            for k in ("event_kernel", "scatter", "tail_kernel", "other")
        },
        "significant_ops_per_frame": {
            k: round(sig_cnt[k] / frames, 2)
            for k in ("event_kernel", "scatter", "tail_kernel", "other")
        },
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
