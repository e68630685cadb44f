"""Streaming end-to-end latency benchmark (BASELINE.md: p50 depth-frame
latency on ESL seq1).

The real ESL seq1 recording cannot be downloaded in this environment
(zero network egress; see EVAL_ESL.md), so an ESL-seq1-like stream is
synthesized at the same rates (60 Hz projector, ~28k events/frame,
640x480 camera) and replayed through the full runtime path: EVT3 decode
-> delta_t packetization -> polarity+activity filter -> trigger finder
-> host staging (io.prefetch) -> staged device frame program.

Latency per depth frame = wall time from the trigger finder handing over
the frame's events to the depth frame being COMPUTED on device, proven
by fetching a 4-byte scalar of the result (num_inliers).  The tunneled
device here adds a host<->device round trip a production (PCIe-attached)
host would not pay; it is measured separately and an adjusted figure is
reported.  Fetching the full 2.7 MB colorized frame over the tunnel is
bandwidth-bound (~100 ms) and reported as display_fetch_ms for
transparency -- on co-located hosts that copy is microseconds.

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np


def main():
    from xmaps_tpu.utils.jaxenv import respect_jax_platforms

    respect_jax_platforms()  # honor an explicit JAX_PLATFORMS (e.g. cpu)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/xmaps_tpu/jax_cache"),
    )

    from xmaps_tpu.calib.maps import CalibrationParams
    from xmaps_tpu.io.evt_encode import encode_evt3
    from xmaps_tpu.io.event_iterator import FileEventsIterator
    from xmaps_tpu.io.filters import ActivityNoiseFilter
    from xmaps_tpu.io.prefetch import HostStagingPool
    from xmaps_tpu.models.depth_pipeline import XMapsDepthEngine
    from xmaps_tpu.runtime.trigger_finder import RobustTriggerFinder
    from xmaps_tpu.utils.stats import StatsPrinter
    from xmaps_tpu.utils.synthetic import simulate_sequence

    calib_yaml = "/root/reference/data/nebra_evk3.0/X-maps_calibration_8_5mm.yaml"
    if not os.path.exists(calib_yaml):
        calib_yaml = os.path.join(
            os.path.dirname(__file__), "data", "demo_rig", "calibration.yaml"
        )

    n_frames = int(os.environ.get("XMAPS_BENCH_STREAM_FRAMES", "40"))
    fps = 60
    calib = CalibrationParams.from_yaml(calib_yaml, 640, 480, 720, 1280)
    evs = simulate_sequence(
        calib,
        [0.45 + 0.004 * i for i in range(n_frames)],
        fps=fps,
        subsample=0.031,  # ~28k events/frame, ESL-seq1-like density
        rng=np.random.default_rng(11),
    )
    raw_path = "/tmp/bench_stream_seq.raw"
    with open(raw_path, "wb") as f:
        f.write(encode_evt3(evs, 640, 480))

    # absorb the first-contact + first-large-transfer tunnel stalls (see
    # bench.py) before timing
    jax.block_until_ready(jax.device_put(np.zeros(8, np.float32)) + 1)
    jax.block_until_ready(jax.device_put(np.zeros(32 << 20, np.uint8)))
    np.asarray(jax.device_put(np.zeros(1 << 20, np.uint8)))  # first D2H

    t0 = time.perf_counter()
    engine = XMapsDepthEngine.from_calibration(
        calib,
        event_capacity=32 * 1024,
        z_near=0.2,
        z_far=1.2,
        xmap_cache_dir=os.path.expanduser("~/.cache/xmaps_tpu"),
    )
    setup_s = time.perf_counter() - t0
    import sys as _sys
    _t_prog = time.perf_counter()

    def _mark(tag):
        print(f"[bench_stream +{time.perf_counter() - _t_prog:.1f}s] {tag}", file=_sys.stderr, flush=True)

    _mark(f"engine ready (setup {setup_s:.1f}s)")

    pool = HostStagingPool(
        engine.cfg.event_capacity, depth=2, layout=engine.compact_layout
    )
    act_filter = ActivityNoiseFilter(
        640, 480, window_us=int(1e6 / fps), keep_polarity=1
    )

    lat_s: list[float] = []
    ks_seen: list[int] = []
    results = []

    def on_frame_compact(frame_evs):
        t0 = time.perf_counter()
        # 1 uint32/event compact staging (host-binned time) -- the
        # segmented-staging fallback path, io/prefetch.py.  Without a
        # CompactLayout (very large sensors) use 2-word staging instead.
        if engine.compact_layout is not None:
            batch = pool.stage_compact(frame_evs)
        else:
            batch = pool.stage(frame_evs)
        res = engine.process_staged(batch)
        # 4-byte completion probe: the depth frame is computed and
        # resident on device once this returns
        n_inl = int(res.num_inliers)
        lat_s.append(time.perf_counter() - t0)
        results.append((n_inl, res))
        del results[:-1]

    host_pre_s: list[float] = []
    host_work_s: list[float] = []

    def replay(mode):
        """mode 'ring' = packet pre-staging (the production streaming
        path: event data crosses the link during frame accumulation, so
        dispatch ships only a (3, K) placement array); 'compact' =
        segmented staging after the trigger; 'direct' = the ring path
        WITHOUT any completion fetch (host handover->dispatch time only;
        device execution time comes from the profiler trace)."""
        from xmaps_tpu.io.prefetch import PacketRing

        if mode == "direct":
            ring = PacketRing(
                packet_capacity=max(2048, engine.cfg.event_capacity // 4),
                layout=engine.ring_layout,
            )

            def on_frame_direct(frame_evs, gs):
                t0 = time.perf_counter()
                out = ring.frame_meta(
                    gs, gs + len(frame_evs), int(frame_evs["t"][0])
                )
                assert out is not None, "ring overrun in bench"
                pkts, meta = out
                # pure host framework work (everything before the first
                # backend interaction)
                host_work_s.append(time.perf_counter() - t0)
                res = engine.process_ring(pkts, meta)
                # ASYNC: no fetch, no block -- link physics excluded by
                # construction; the device-side duration is read from the
                # profiler trace afterwards
                host_pre_s.append(time.perf_counter() - t0)
                results.append((0, res))
                del results[:-1]
                ring.retire_below(tf.buffer_global_base)

            tf = RobustTriggerFinder(
                projector_fps=fps,
                stats=StatsPrinter(silent=True),
                frame_callback=lambda evs: None,
                frame_callback_indexed=on_frame_direct,
            )
        elif mode == "ring":
            ring = PacketRing(
                packet_capacity=max(2048, engine.cfg.event_capacity // 4),
                layout=engine.ring_layout,
            )

            def on_frame_ring(frame_evs, gs):
                t0 = time.perf_counter()
                out = ring.frame_meta(
                    gs, gs + len(frame_evs), int(frame_evs["t"][0])
                )
                assert out is not None, "ring overrun in bench"
                pkts, meta = out
                res = engine.process_ring(pkts, meta)
                n_inl = int(res.num_inliers)
                lat_s.append(time.perf_counter() - t0)
                ks_seen.append(len(pkts))
                results.append((n_inl, res))
                del results[:-1]
                ring.retire_below(tf.buffer_global_base)

            tf = RobustTriggerFinder(
                projector_fps=fps,
                stats=StatsPrinter(silent=True),
                frame_callback=lambda evs: None,
                frame_callback_indexed=on_frame_ring,
            )
        else:
            ring = None
            tf = RobustTriggerFinder(
                projector_fps=fps,
                stats=StatsPrinter(silent=True),
                frame_callback=on_frame_compact,
            )
        act_filter.reset()
        # Real-time pacing: packets are delivered at the projector's
        # rate, as a live camera would.  Unpaced (faster-than-real-time)
        # replay back-pressures the host->device link with future
        # frames' transfers and measures queueing, not latency.
        wall0 = time.perf_counter()
        t_ev0 = None
        for pkt in FileEventsIterator(raw_path, delta_t=1e6 / fps / 4):
            if not len(pkt):
                continue
            if t_ev0 is None:
                t_ev0 = int(pkt["t"][0])
            due = (int(pkt["t"][-1]) - t_ev0) / 1e6
            lag = due - (time.perf_counter() - wall0)
            if lag > 0:
                time.sleep(lag)
            pkt = act_filter.process(pkt)
            if ring is not None and len(pkt):
                ring.stage_packets(pkt)
            tf.process_events(pkt)

    _mark("ring warmup")
    replay("ring")  # warmup (compiles)
    assert results and results[-1][0] > 1000, "pipeline produced no inliers"
    lat_s.clear()
    replay("ring")
    lat_ring = list(lat_s)

    _mark("compact warmup")
    replay("compact")  # warmup (compiles the segmented program)
    lat_s.clear()
    replay("compact")
    lat_compact = list(lat_s)
    lat_s = lat_ring

    # --- DIRECT framework latency: link physics excluded by
    # construction, not by baseline subtraction.  Host side: trigger
    # handover -> (staging meta + async dispatch) returns, nothing
    # fetched.  Device side: the frame program's own execution duration,
    # read from a jax.profiler device trace of the same replay.  Their
    # sum is what a co-located host would observe (its dispatch-to-start
    # and data-dependency gaps are ~us at these sizes).
    import glob
    import gzip
    import shutil

    trace_dir = "/tmp/xmaps_stream_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    host_pre_s.clear()
    host_work_s.clear()
    _mark("direct trace replay")
    with jax.profiler.trace(trace_dir):
        replay("direct")
        if results:
            jax.block_until_ready(results[-1][1])
    host_pre = np.asarray(host_pre_s) * 1e3
    host_work = np.asarray(host_work_s) * 1e3

    # Device-clock frame path, one cluster per dispatched frame.  The
    # intended start endpoint is the arrival of the frame's (3, k) meta
    # copy on the device timeline; the end is the frame program module's
    # end.  Through the tunneled device the profiler trace carries NO
    # H2D-transfer events at all (the only "copy*" events are
    # program-INTERNAL HLO copy-start/done ops, which begin after the
    # module starts) -- so the meta copy is identified strictly: a
    # device-timeline event OUTSIDE any module whose long_name matches
    # the (3, k) s32 meta shape.  Frames where no such event exists fall
    # back to the module's own start and are COUNTED in
    # frame_path_fallback_frames; if every frame fell back,
    # p50_device_frame_path_ms is reported as None (the module duration
    # already appears as p50_device_program_ms -- it is not re-published
    # under the meta-copy definition).
    dev_durs_ms = []
    frame_path_ms = []
    frame_path_fallbacks = 0
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if paths:
        with gzip.open(paths[0], "rt") as f:
            trace = json.load(f)
        pid_names = {}
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
        device_pids = {
            p for p, n in pid_names.items()
            if "TPU" in n or "/device" in n.lower()
        }
        modules = []  # (ts, end) of each ring frame program execution
        copies = []  # (ts) of candidate meta-copy events
        import re as _re

        meta_re = _re.compile(r"s32\[3,\d+\]")
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            if device_pids and ev.get("pid") not in device_pids:
                continue
            name = ev.get("name", "")
            ts, dur = ev.get("ts", 0.0), ev.get("dur", 0.0)
            if name.startswith("jit_") and "ring_frame" in name:
                # the module-level execution event jit_ring_frame...(...);
                # kernel sub-events repeat the name WITHOUT the jit_ prefix
                modules.append((ts, ts + dur))
                dev_durs_ms.append(dur / 1e3)
            elif "copy" in name.lower() or "transfer" in name.lower():
                long_name = str(ev.get("args", {}).get("long_name", ""))
                if meta_re.search(long_name) or meta_re.search(name):
                    copies.append(ts)
        modules.sort()
        # drop meta-copy candidates that fall INSIDE a module's span
        # (program-internal copies of the meta argument, not its arrival)
        mod_starts = np.asarray([m[0] for m in modules])
        mod_ends = np.asarray([m[1] for m in modules])

        def outside_modules(ts):
            i = np.searchsorted(mod_starts, ts) - 1
            return i < 0 or ts > mod_ends[i]

        copies = sorted(t for t in copies if outside_modules(t))
        copies = np.asarray(copies, dtype=np.float64)
        for ts, end in modules:
            # the frame's meta copy lands in the gap since the previous
            # frame (>= 10 ms at 60 Hz): take the LATEST matching copy
            # within 8 ms before the program start
            lo = np.searchsorted(copies, ts - 8000.0)
            hi = np.searchsorted(copies, ts)
            if hi > lo:
                start = copies[hi - 1]
            else:
                start = ts
                frame_path_fallbacks += 1
            frame_path_ms.append((end - start) / 1e3)
        if frame_path_fallbacks == len(modules):
            frame_path_ms = []  # unobservable: do not republish module dur
    p50_host_pre = float(np.percentile(host_pre, 50)) if len(host_pre) else None
    p50_host_work = (
        float(np.percentile(host_work, 50)) if len(host_work) else None
    )
    p50_dev = (
        float(np.percentile(dev_durs_ms, 50)) if dev_durs_ms else None
    )
    p50_dev_path = (
        float(np.percentile(frame_path_ms, 50)) if frame_path_ms else None
    )

    # Co-located dispatch-issue estimate, measured (not assumed): the
    # async issue cost of a structure-matched jitted call on the host's
    # OWN (CPU) backend -- the in-process dispatch path a PCIe-attached
    # accelerator host runs, with no tunnel RPC in it.  This is ADDED to
    # the direct figure (conservative direction), never subtracted.
    # (the site plugin restricts this process to the tunneled backend, so
    # the probe runs in a JAX_PLATFORMS=cpu subprocess)
    colocated_dispatch_ms = None
    try:
        import subprocess

        probe = (
            "import time, numpy as np\n"
            "import jax, jax.numpy as jnp\n"
            "from xmaps_tpu.utils.jaxenv import respect_jax_platforms\n"
            "respect_jax_platforms()\n"
            "meta = np.zeros((3, 5), np.int32)\n"
            "bufs = tuple(jax.device_put(np.zeros(1024, np.uint32))"
            " for _ in range(5))\n"
            "@jax.jit\n"
            "def f(bufs, meta):\n"
            "    acc = meta.sum()\n"
            "    for b in bufs:\n"
            "        acc = acc + b[0].astype(jnp.int32)\n"
            "    return acc\n"
            "jax.block_until_ready(f(bufs, meta))\n"
            "ts = []\n"
            "for _ in range(60):\n"
            "    t1 = time.perf_counter()\n"
            "    r = f(bufs, meta)\n"
            "    ts.append(time.perf_counter() - t1)\n"
            "    jax.block_until_ready(r)\n"
            "print(float(np.percentile(ts, 50) * 1e3))\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [_sys.executable, "-c", probe],
            capture_output=True, text=True, timeout=180, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        colocated_dispatch_ms = float(out.stdout.strip().splitlines()[-1])
    except Exception:
        import traceback

        traceback.print_exc(file=_sys.stderr)

    # Derived co-located estimate (NOT a single measured interval): the
    # sum of three separately measured terms.  The device term prefers
    # the meta-copy-anchored frame path; when the tunneled trace exposes
    # no transfer events (the usual case here -- see above), it uses the
    # module execution duration and says so in direct_definition.
    p50_direct = None
    direct_definition = None
    dev_term = p50_dev_path if p50_dev_path is not None else p50_dev
    if dev_term is not None and p50_host_work is not None:
        p50_direct = round(
            p50_host_work + (colocated_dispatch_ms or 0.0) + dev_term, 3
        )
        direct_definition = (
            "derived co-located estimate: wall-clock host framework work "
            "+ CPU-backend dispatch-issue proxy + device "
            + (
                "frame path (meta-copy arrival -> program end, both on "
                "the device timeline)"
                if p50_dev_path is not None
                else "program module duration (meta-copy arrival is not "
                "observable in the tunneled device trace; "
                f"{frame_path_fallbacks} frames fell back)"
            )
        )

    # Tunnel round-trip baseline a PCIe-attached host would not pay:
    # dispatch + 4-byte fetch of a trivial program.
    dev_one = jax.device_put(np.int32(1))
    add_one = jax.jit(lambda v: v + 1)
    int(add_one(dev_one))
    _mark("rtt probe")
    rtt = []
    for _ in range(40):
        t1 = time.perf_counter()
        int(add_one(dev_one))
        rtt.append(time.perf_counter() - t1)
    rtt_p50_ms = float(np.percentile(rtt, 50) * 1e3)

    # Structure-matched dispatch baseline: a trivial program taking the
    # SAME argument structure as the ring dispatch (the measured runs'
    # typical packet count k of slot pairs + the (3, k) host meta array +
    # the LUT tables) and returning one scalar.  Through a tunneled
    # device, marshalling the buffer handles and shipping the meta costs
    # several ms that a co-located host would not pay; p50 minus this
    # baseline isolates the latency the framework itself adds (device
    # compute + its real dispatch).
    _k = int(np.bincount(ks_seen).argmax()) if ks_seen else 5

    cap = engine.cfg.event_capacity // 2
    null_xys = tuple(
        jax.device_put(np.zeros(cap, np.uint32)) for _ in range(_k)
    )
    null_tps = tuple(
        jax.device_put(np.zeros(cap, np.int32)) for _ in range(_k)
    )

    import jax.numpy as jnp

    @jax.jit
    def null_dispatch(xys, tps, meta, tables):
        acc = meta.sum()
        for a, b in zip(xys, tps):
            acc = acc + a[0].astype(jnp.int32) + b[0]
        return acc + tables.x_map[0, 0].astype(jnp.int32)

    meta0 = np.zeros((3, _k), np.int32)
    int(null_dispatch(null_xys, null_tps, meta0, engine.tables))
    _mark("null dispatch baseline")
    base = []
    for _ in range(40):
        t1 = time.perf_counter()
        int(null_dispatch(null_xys, null_tps, meta0, engine.tables))
        base.append(time.perf_counter() - t1)
    dispatch_p50_ms = float(np.percentile(base, 50) * 1e3)

    # The same null dispatch issued right after an in-flight packet-sized
    # H2D copy that the program CONSUMES -- the real path's timeline (the
    # frame's last packet is still crossing the tunnel when the trigger
    # fires, and the frame program depends on it).  Subtracting THIS
    # baseline additionally removes the link-dependency cost a PCIe host
    # would not see at these sizes (~10 us there vs ms through a tunnel).
    @jax.jit
    def null_dispatch_dep(fresh, xys, tps, meta, tables):
        acc = meta.sum() + fresh[0].astype(jnp.int32)
        for a, b in zip(xys, tps):
            acc = acc + a[0].astype(jnp.int32) + b[0]
        return acc + tables.x_map[0, 0].astype(jnp.int32)

    pkt_buf = np.zeros(2 * cap, np.uint32)
    int(null_dispatch_dep(
        jax.device_put(pkt_buf), null_xys, null_tps, meta0, engine.tables
    ))
    _mark("contended baseline")
    base_c = []
    for _ in range(40):
        t1 = time.perf_counter()
        h = jax.device_put(pkt_buf)  # async, like PacketRing staging
        int(null_dispatch_dep(h, null_xys, null_tps, meta0, engine.tables))
        base_c.append(time.perf_counter() - t1)
    contended_p50_ms = float(np.percentile(base_c, 50) * 1e3)

    # Display-path cost over the tunnel (bandwidth-bound, environment
    # overhead): first fetch of a freshly computed 2.7 MB BGR frame
    # (jax caches the host copy, so only the first fetch is honest).
    _mark("display fetch probe")
    fetch = []
    frame_nbytes = 0
    for _ in range(3):
        # reuse the compact-staging program the replay already compiled
        # (the probe times the frame TRANSFER; which staging tier computed
        # the frame is irrelevant, and the 2-word tier would force a third
        # program compile just for this).  Configs without a CompactLayout
        # (very large sensors) fall back to 2-word staging.
        if engine.compact_layout is not None:
            res = engine.process_staged(pool.stage_compact(evs[: 28 * 1024]))
        else:
            res = engine.process_staged(pool.stage(evs[: 28 * 1024]))
        int(res.num_inliers)  # compute done; now time the pure transfer
        t1 = time.perf_counter()
        img = np.asarray(jax.device_get(res.frame_bgr))
        fetch.append(time.perf_counter() - t1)
        frame_nbytes = img.nbytes
    display_fetch_ms = float(np.percentile(fetch, 50) * 1e3)
    # the fetch doubles as a link-bandwidth probe: the tunnel's quality
    # varies by session and bounds how many staged bytes/frame fit in the
    # 60 Hz budget -- record it so runs are comparable
    link_mbytes_s = frame_nbytes / max(display_fetch_ms, 1e-3) / 1e3

    lat = np.asarray(lat_s) * 1e3
    p50 = float(np.percentile(lat, 50))
    p95 = float(np.percentile(lat, 95))
    result = {
        "metric": "stream_p50_latency_ms",
        "value": round(p50, 3),
        "unit": "ms",
        # conservative: raw p50 against the reference's 2.67 ms, with NO
        # environment adjustment (the adjusted figures live in extra)
        "vs_baseline": round(2.67 / max(p50, 1e-6), 2),
        "extra": {
            "p95_ms": round(p95, 3),
            # DIRECT framework latency, no baseline subtraction anywhere:
            # host framework work (trigger handover -> first backend call)
            # + measured co-located dispatch issue (CPU backend, ADDED)
            # + the device-clock frame path (meta-copy arrival -> frame
            # program end, both endpoints on the device timeline, so the
            # tunnel's RPC issuance and link transfer never enter)
            "p50_framework_direct_ms": p50_direct,
            "direct_definition": direct_definition,
            "frame_path_fallback_frames": frame_path_fallbacks,
            "p50_host_framework_work_ms": (
                round(p50_host_work, 4) if p50_host_work is not None else None
            ),
            "colocated_dispatch_issue_ms": (
                round(colocated_dispatch_ms, 4)
                if colocated_dispatch_ms is not None
                else None
            ),
            "p50_device_frame_path_ms": (
                round(p50_dev_path, 3) if p50_dev_path is not None else None
            ),
            "p50_host_handover_to_dispatch_tunnel_ms": (
                round(p50_host_pre, 3) if p50_host_pre is not None else None
            ),
            "p50_device_program_ms": (
                round(p50_dev, 3) if p50_dev is not None else None
            ),
            "p50_ms_rtt_adjusted": round(p50 - rtt_p50_ms, 3),
            "p50_framework_ms": round(p50 - dispatch_p50_ms, 3),
            "p50_framework_contention_adjusted_ms": round(
                p50 - contended_p50_ms, 3
            ),
            "dispatch_baseline_p50_ms": round(dispatch_p50_ms, 3),
            "dispatch_baseline_contended_p50_ms": round(
                contended_p50_ms, 3
            ),
            "ring_packets_per_frame_mode": _k,
            "ring_staged_bytes_per_frame": _k
            * max(2048, engine.cfg.event_capacity // 4)
            * (4 if engine.ring_layout is not None else 8),
            "link_mbytes_s_display_fetch": round(link_mbytes_s, 1),
            "p50_segmented_staging_ms": round(
                float(np.percentile(np.asarray(lat_compact) * 1e3, 50)), 3
            ),
            "tunnel_rtt_p50_ms": round(rtt_p50_ms, 3),
            "display_fetch_tunnel_ms": round(display_fetch_ms, 3),
            "frames_measured": len(lat),
            "events_per_frame": int(len(evs) / n_frames),
            "setup_s": round(setup_s, 2),
            "note": "synthetic ESL-seq1-like stream (real data: zero "
            "egress, see EVAL_ESL.md). Latency = trigger handover -> "
            "depth frame computed on device (4-byte completion probe), "
            "through decode/filters/segmentation/staging/device program. "
            "The tunnel RTT and the tunnel-bandwidth display fetch are "
            "environment costs absent on a PCIe-attached host.",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
