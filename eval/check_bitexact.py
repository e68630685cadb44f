"""Bit-exactness sweep: fused Pallas frame program vs the XLA oracle.

For each geometry (demo / ESL eval rig) x camera perspective x several
plane depths, compiles BOTH the full fused pipeline (Pallas event +
tail kernels, host target-sorted batches, sort-free runs scatter) and
the plain XLA path on the attached device, and asserts every FrameResult
field is identical.  This is the gate every kernel/presort change must
pass on the REAL TPU before it ships (interpret mode alone misses
Mosaic lowering and scatter-uniqueness hazards).

Usage:
    python eval/check_bitexact.py                 # full sweep
    python eval/check_bitexact.py --geometry esl  # one rig
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_calib(geometry: str):
    from xmaps_tpu.utils.synthetic import make_synthetic_calibration

    if geometry == "esl":
        calib = make_synthetic_calibration(
            camera_width=640, camera_height=480,
            projector_width=1080, projector_height=1920,
        )
        return dataclasses.replace(
            calib, rect_image_width=3 * 1080, rect_image_height=3 * 1920
        )
    return make_synthetic_calibration(
        camera_width=640, camera_height=480,
        projector_width=720, projector_height=1280,
    )


def main(argv=None):
    from xmaps_tpu.utils.jaxenv import respect_jax_platforms

    respect_jax_platforms()  # honor an explicit JAX_PLATFORMS (e.g. cpu)
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", choices=["esl", "demo", "both"],
                    default="both")
    ap.add_argument("--events", type=int, default=28 * 1024)
    ap.add_argument("--depths", type=float, nargs="+",
                    default=[0.35, 0.6, 1.0])
    args = ap.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/xmaps_tpu/jax_cache"),
    )
    from xmaps_tpu.models.depth_pipeline import XMapsDepthEngine
    from xmaps_tpu.ops.event_batch import EventBatch
    from xmaps_tpu.ops.frame_pipeline import depth_frame
    from xmaps_tpu.utils.synthetic import simulate_plane_events

    dev = jax.devices()[0]
    print("device:", dev)
    jax.block_until_ready(jax.device_put(np.zeros(32 << 20, np.uint8), dev))

    geoms = ["demo", "esl"] if args.geometry == "both" else [args.geometry]
    failures = 0
    for geom in geoms:
        calib = make_calib(geom)
        for persp in (False, True):
            fused = XMapsDepthEngine.from_calibration(
                calib, event_capacity=args.events, z_near=0.2, z_far=1.2,
                xmap_cache_dir=os.path.expanduser("~/.cache/xmaps_tpu"),
                camera_perspective=persp,
            )
            plain = XMapsDepthEngine.from_calibration(
                calib, event_capacity=args.events, z_near=0.2, z_far=1.2,
                xmap_cache_dir=os.path.expanduser("~/.cache/xmaps_tpu"),
                use_pallas_events=False, use_pallas_tail=False,
                camera_perspective=persp,
            )
            rng = np.random.default_rng(11)
            for depth_m in args.depths:
                ev = simulate_plane_events(
                    calib, depth_m=depth_m, subsample=0.031, jitter_us=2.0,
                    rng=rng,
                )
                # duplicate a stride: many same-target lanes with
                # distinct priorities (the later arrival must win)
                ev = np.concatenate([ev, ev[::7]])[: args.events - 512]
                b, prio, bands = fused.make_sorted_batch(ev)

                @jax.jit
                def run_fused(b, prio, bands):
                    return depth_frame(
                        b, fused.tables, fused.cfg,
                        tail_plan=fused.tail_plan,
                        event_plan=fused.event_plan,
                        presort_priority=prio, presort_bands=bands,
                        presort_runs=True,
                    )

                @jax.jit
                def run_plain(b):
                    return depth_frame(b, plain.tables, plain.cfg)

                @jax.jit
                def run_packed(b, prio, bands):
                    return depth_frame(
                        b, fused.tables, fused.cfg,
                        tail_plan=fused.tail_plan,
                        event_plan=fused.event_plan,
                        presort_priority=prio, presort_bands=bands,
                        presort_runs=True,
                        display_only=True, display_packed=True,
                    )

                @jax.jit
                def run_winners(b, ts, prio, bands, n_inl):
                    return depth_frame(
                        b, fused.tables, fused.cfg,
                        tail_plan=fused.tail_plan,
                        event_plan=fused.event_plan,
                        t_scaled=ts,
                        presort_priority=prio, presort_bands=bands,
                        presort_unique=True, host_num_inliers=n_inl,
                        display_only=True, display_packed=True,
                    )

                got = jax.block_until_ready(run_fused(b, prio, bands))
                ref = jax.block_until_ready(
                    run_plain(
                        EventBatch.from_structured(ev, args.events)
                    )
                )
                ok = True
                for field in ("frame_bgr", "depth", "disp_map"):
                    g, r = getattr(got, field), getattr(ref, field)
                    if not np.array_equal(np.asarray(g), np.asarray(r)):
                        ok = False
                        print(f"MISMATCH {geom} persp={persp} "
                              f"depth={depth_m} field={field}")
                if int(got.num_inliers) != int(ref.num_inliers):
                    ok = False
                    print(f"MISMATCH {geom} persp={persp} "
                          f"depth={depth_m} num_inliers "
                          f"{int(got.num_inliers)} != {int(ref.num_inliers)}")
                # packed-BGR display surface: the streaming programs'
                # per-frame output (one u32 plane; host view-unpacks)
                pk = jax.block_until_ready(run_packed(b, prio, bands))
                arr = np.ascontiguousarray(np.asarray(pk.frame_bgr))
                h, w = arr.shape
                unpacked = arr.view(np.uint8).reshape(h, w, 4)[..., :3]
                if not np.array_equal(unpacked, np.asarray(ref.frame_bgr)):
                    ok = False
                    print(f"MISMATCH {geom} persp={persp} depth={depth_m} "
                          f"field=frame_bgr (packed display)")
                if int(pk.num_inliers) != int(ref.num_inliers):
                    ok = False
                    print(f"MISMATCH {geom} persp={persp} depth={depth_m} "
                          f"num_inliers (packed display)")

                # UNSORTED device path (the streaming ring's core: the
                # packed 2-operand banding sort runs on device, no host
                # presort -- ops/disparity.py round 5)
                @jax.jit
                def run_unsorted(b):
                    return depth_frame(
                        b, fused.tables, fused.cfg,
                        tail_plan=fused.tail_plan,
                        event_plan=fused.event_plan,
                    )

                us = jax.block_until_ready(
                    run_unsorted(EventBatch.from_structured(ev, args.events))
                )
                for field in ("frame_bgr", "depth", "disp_map"):
                    g, r = getattr(us, field), getattr(ref, field)
                    if not np.array_equal(np.asarray(g), np.asarray(r)):
                        ok = False
                        print(f"MISMATCH {geom} persp={persp} "
                              f"depth={depth_m} field={field} "
                              f"(unsorted/packed device sort)")
                if int(us.num_inliers) != int(ref.num_inliers):
                    ok = False
                    print(f"MISMATCH {geom} persp={persp} depth={depth_m} "
                          f"num_inliers (unsorted/packed device sort)")

                # host winner pre-compaction: event kernel + scatter on
                # ~winner-count lanes (make_winner_batch, presort_unique)
                wb = fused.make_winner_batch(ev)
                wn = jax.block_until_ready(run_winners(*tuple(wb)))
                arr = np.ascontiguousarray(np.asarray(wn.frame_bgr))
                h, w = arr.shape
                unpacked = arr.view(np.uint8).reshape(h, w, 4)[..., :3]
                if not np.array_equal(unpacked, np.asarray(ref.frame_bgr)):
                    ok = False
                    print(f"MISMATCH {geom} persp={persp} depth={depth_m} "
                          f"field=frame_bgr (winner compaction)")
                if int(wn.num_inliers) != int(ref.num_inliers):
                    ok = False
                    print(f"MISMATCH {geom} persp={persp} depth={depth_m} "
                          f"num_inliers (winner compaction) "
                          f"{int(wn.num_inliers)} != {int(ref.num_inliers)}")

                if ok:
                    print(f"OK {geom} persp={persp} depth={depth_m} "
                          f"inliers={int(ref.num_inliers)} "
                          f"(+packed +unsorted +winners)")
                else:
                    failures += 1
    if failures:
        print(f"{failures} FAILURES")
        sys.exit(1)
    print("ALL BIT-EXACT")


if __name__ == "__main__":
    main()
