"""Stage-by-stage timing of the fused frame program on the real device.

Times, with the same group-differencing method as bench.py:
  A. per-event stage only (Pallas gather kernel -> disparity)
  B. per-event + scatter (packed sorted-dedup)
  C. full program (event + scatter + fused Pallas tail)
  D. tail alone (on a fixed packed map)

Prints a JSON dict of per-frame microseconds per stage.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, frames, n_small=4, n_large=16, trials=5):
    import jax

    def round_(k):
        outs = []
        t0 = time.perf_counter()
        for _ in range(k):
            outs.append(fn(frames))
            if len(outs) > 3:
                outs.pop(0)
        jax.block_until_ready(outs[-1])
        # 4-byte fetch proves completion through the tunnel
        np.asarray(jax.tree.leaves(outs[-1])[0]).ravel()[:1]
        return time.perf_counter() - t0

    fn(frames)
    t_s = min(round_(n_small) for _ in range(trials))
    t_l = min(round_(n_large) for _ in range(trials))
    return (t_l - t_s) / (n_large - n_small) / len(frames)


def main():
    from xmaps_tpu.utils.jaxenv import respect_jax_platforms

    respect_jax_platforms()  # honor an explicit JAX_PLATFORMS (e.g. cpu)
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/xmaps_tpu/jax_cache"),
    )
    import functools

    from xmaps_tpu.models.depth_pipeline import XMapsDepthEngine
    from xmaps_tpu.ops.disparity import compute_event_disparity_pallas
    from xmaps_tpu.ops.event_batch import EventBatch
    from xmaps_tpu.ops.scatter import PACK, scatter_disp_packed
    from xmaps_tpu.ops.pallas_tail import pallas_tail
    from xmaps_tpu.utils.synthetic import (
        make_synthetic_calibration,
        simulate_plane_events,
    )

    dev = jax.devices()[0]
    jax.block_until_ready(jax.device_put(np.zeros(8, np.float32), dev) + 1)

    calib = make_synthetic_calibration(
        camera_width=640, camera_height=480,
        projector_width=720, projector_height=1280,
    )
    engine = XMapsDepthEngine.from_calibration(
        calib, event_capacity=28 * 1024, z_near=0.2, z_far=1.2,
        xmap_cache_dir=os.path.expanduser("~/.cache/xmaps_tpu"),
    )
    cfg, tables, ep, tp = engine.cfg, engine.tables, engine.event_plan, engine.tail_plan

    rng = np.random.default_rng(7)
    frames = []
    for i in range(24):
        ev = simulate_plane_events(
            calib, depth_m=0.45 + 0.02 * i, subsample=0.031,
            jitter_us=2.0, rng=rng,
        )
        frames.append(EventBatch.from_structured(ev, cfg.event_capacity))
    frames = [jax.device_put(b, dev) for b in frames]

    def stage_events(bs):
        outs = []
        for b in bs:
            res, _, _ = compute_event_disparity_pallas(
                b, ep, t_px_scale=cfg.t_px_scale
            )
            outs.append(res.disp.sum() + res.inlier.sum())
        return outs

    def stage_scatter(bs):
        outs = []
        for b in bs:
            res, (ex, ey), pri = compute_event_disparity_pallas(
                b, ep, t_px_scale=cfg.t_px_scale
            )
            pm = scatter_disp_packed(
                res.y_rect,
                res.x_rect + res.disp.astype("int32"),
                res.disp, res.inlier,
                height=cfg.rect_height, width=cfg.rect_width,
                priority=pri,
                pad_shape=(tp.H_pad, tp.W_pad),
                method="sorted",
            )
            outs.append(pm.sum())
        return outs

    def stage_full(bs):
        from xmaps_tpu.ops.frame_pipeline import depth_frame
        # return the full result so nothing is dead-code-eliminated
        return [
            depth_frame(b, tables, cfg, tail_plan=tp, event_plan=ep)
            for b in bs
        ]

    def stage_sort_y(bs):
        import jax as _jax
        outs = []
        for b in bs:
            n = b.x.shape[0]
            prio0 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
            srt = _jax.lax.sort(
                (b.y, b.x, b.t, b.valid.astype(jnp.int32), prio0),
                num_keys=1, is_stable=True,
            )
            outs.append(srt[0][0] + srt[4][-1])
        return outs

    def stage_sort_scatter(bs):
        import jax as _jax
        outs = []
        for b in bs:
            n = b.x.shape[0]
            lin = b.y * cfg.rect_width + b.x  # same dtype/shape as real keys
            packed = b.t.astype(jnp.uint32)
            lin_s, packed_s = _jax.lax.sort((lin, packed), num_keys=2)
            outs.append(lin_s[0] + packed_s[-1])
        return outs

    # fixed packed maps for tail-only timing
    def make_packed(b):
        res, _, pri = compute_event_disparity_pallas(
            b, ep, t_px_scale=cfg.t_px_scale
        )
        return scatter_disp_packed(
            res.y_rect, res.x_rect + res.disp.astype("int32"),
            res.disp, res.inlier,
            height=cfg.rect_height, width=cfg.rect_width,
            priority=pri, pad_shape=(tp.H_pad, tp.W_pad),
            method="sorted",
        )

    packed = [jax.jit(make_packed)(b) for b in frames]
    jax.block_until_ready(packed)

    def stage_tail(pms):
        return [
            pallas_tail(pm, tp, pack=PACK)[0][0, 0, 0] for pm in pms
        ]

    out = {}
    for name, fn, args in [
        ("event_us", stage_events, frames),
        ("event_scatter_us", stage_scatter, frames),
        ("full_us", stage_full, frames),
        ("tail_only_us", stage_tail, packed),
        ("sort_y5_us", stage_sort_y, frames),
        ("sort_scatter2_us", stage_sort_scatter, frames),
    ]:
        jfn = jax.jit(fn)
        out[name] = round(timed(jfn, args) * 1e6, 1)
    out["scatter_us"] = round(out["event_scatter_us"] - out["event_us"], 1)
    out["glue_us"] = round(
        out["full_us"] - out["event_scatter_us"] - out["tail_only_us"], 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
