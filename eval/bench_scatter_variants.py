"""Micro-benchmark: is the production scatter paying for fused per-lane
compute inside its serialized store loop?

eval/bench_store_loop.py measured a BARE unique-indices XLA scatter-set
at ~2.95 ns/store, while the production runs-scatter fusion costs
~4.7 ns/lane (BENCH_ESL_r04.json stage budget).  The production fusion
inlines winner detection (rolls/compares), the packing select, and the
div/mod 2D index math into the scatter's store loop; if XLA evaluates
those per store iteration, splitting the fusion with
jax.lax.optimization_barrier (materialize indices + values first, then a
bare scatter) trades ~0.5 MB of HBM traffic (<1 us) for a tighter store
loop — potentially ~-40 us on every frame.

Variants, at the REAL ESL tail-plan shapes (crop window + padded map):

  runs_fused     production scatter_disp_packed(method='runs')
  runs_split     same, optimization_barrier before the .set
  sorted_fused   production method='sorted' (the streaming ring path)
  sorted_split   same, optimization_barrier before the .set
  bare_set       precomputed unique (r,c,v): the floor

Prints ONE JSON line; group-differenced device timing (per-group minima,
see memory notes on tunnel jitter).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from xmaps_tpu.utils.jaxenv import respect_jax_platforms

    respect_jax_platforms()
    import argparse
    import dataclasses

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny-geometry CPU smoke (flow check only)")
    args = ap.parse_args()

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/xmaps_tpu/jax_cache"),
    )
    from xmaps_tpu.models.depth_pipeline import XMapsDepthEngine
    from xmaps_tpu.ops.scatter import PACK, scatter_disp_packed
    from xmaps_tpu.utils.synthetic import make_synthetic_calibration

    if args.small:
        calib = make_synthetic_calibration(
            camera_width=64, camera_height=48,
            projector_width=54, projector_height=96,
        )
        cap = 2 * 1024
    else:
        calib = make_synthetic_calibration(
            camera_width=640, camera_height=480,
            projector_width=1080, projector_height=1920,
        )
        calib = dataclasses.replace(
            calib, rect_image_width=3 * 1080, rect_image_height=3 * 1920
        )
        cap = 28 * 1024
    engine = XMapsDepthEngine.from_calibration(
        calib, event_capacity=cap, z_near=0.2, z_far=1.2,
        xmap_cache_dir=os.path.expanduser("~/.cache/xmaps_tpu"),
    )
    tp = engine.tail_plan
    cfg = engine.cfg
    if tp is None:  # --small CPU smoke: no Pallas tail plan; fake a crop
        import types

        tp = types.SimpleNamespace(
            crop_row0=8, crop_col0=0, H=cfg.rect_height - 16,
            W=cfg.rect_width - 8,
            H_pad=cfg.rect_height - 16, W_pad=cfg.rect_width,
        )
    window = (tp.crop_row0, tp.crop_col0, tp.H, tp.W)
    pad_shape = (tp.H_pad, tp.W_pad)
    n = cfg.event_capacity
    print(f"# crop window {window}, pad {pad_shape}, n={n}", flush=True)

    # Synthetic frame-like scatter inputs honoring the 'runs' contract:
    # lanes sorted by target key, ~5% duplicate targets, ~3% padding tail,
    # priorities ascending (arange after the sort).
    rng = np.random.default_rng(9)
    n_real = int(n * 0.97)
    n_tgt = int(n_real * 0.95)
    ty = rng.integers(tp.crop_row0, tp.crop_row0 + tp.H, n_tgt)
    tx = rng.integers(tp.crop_col0, tp.crop_col0 + tp.W, n_tgt)
    pick = rng.integers(0, n_tgt, n_real)
    pick[:n_tgt] = np.arange(n_tgt)  # every target covered at least once
    ys = ty[pick]
    xs = tx[pick]
    order = np.lexsort((xs, ys))
    ys, xs = ys[order], xs[order]
    # padding tail: out-of-window key, inlier False
    ys = np.concatenate([ys, np.zeros(n - n_real, np.int64)]).astype(np.int32)
    xs = np.concatenate([xs, np.zeros(n - n_real, np.int64)]).astype(np.int32)
    inl = np.arange(n) < n_real
    disp = rng.integers(1, PACK, n).astype(np.float32)
    ky, kx = ys.copy(), xs.copy()
    dev = jax.devices()[0]
    ys_d, xs_d, disp_d, inl_d, ky_d, kx_d = jax.device_put(
        (ys, xs, disp, inl, ky, kx), dev
    )
    # bare-set floor: one precomputed winner per target pixel
    wy = (ty - tp.crop_row0).astype(np.int32)
    wx = (tx - tp.crop_col0).astype(np.int32)
    wv = rng.integers(1, 1 << 30, n).astype(np.uint32)
    wy = np.concatenate([wy, np.full(n - n_tgt, tp.H_pad, np.int32)])
    wx = np.concatenate([wx, np.zeros(n - n_tgt, np.int32)])
    wy_d, wx_d, wv_d = jax.device_put((wy[:n], wx[:n], wv), dev)

    jax.block_until_ready(jax.device_put(np.zeros(32 << 20, np.uint8), dev))
    np.asarray(jax.device_put(np.zeros(1 << 20, np.uint8), dev))

    H, W = cfg.rect_height, cfg.rect_width

    def runs(d, *, split):
        return scatter_disp_packed(
            ys_d, xs_d, d, inl_d, height=H, width=W,
            priority=jnp.arange(n, dtype=jnp.int32),
            pad_shape=pad_shape, method="runs",
            run_keys=(ky_d, kx_d), window=window, split_stores=split,
        )

    def srt(d, *, split):
        return scatter_disp_packed(
            ys_d, xs_d, d, inl_d, height=H, width=W,
            priority=jnp.arange(n, dtype=jnp.int32),
            pad_shape=pad_shape, method="sorted", window=window,
            split_stores=split,
        )

    def bare(v):
        out = jnp.zeros(pad_shape, jnp.uint32)
        return out.at[wy_d, wx_d].set(v, mode="drop", unique_indices=True)

    def timed(label, fn, var_is_disp=True):
        def group(reps):
            @jax.jit
            def g(d):
                acc = jnp.uint32(0)
                for i in range(reps):
                    out = fn(jnp.roll(d, i) if var_is_disp else d + i)
                    acc = acc + out[0, 0] + out[pad_shape[0] // 2, 64]
                return acc

            return g

        print(f"# {label}: compiling...", flush=True)
        g2, gN = (group(1), group(2)) if args.small else (group(2), group(32))
        jax.block_until_ready(g2(disp_d if var_is_disp else wv_d))
        jax.block_until_ready(gN(disp_d if var_is_disp else wv_d))
        t2s, tNs = [], []
        for _ in range(10):
            a = disp_d if var_is_disp else wv_d
            t0 = time.perf_counter()
            int(g2(a))
            t2s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(gN(a))
            tNs.append(time.perf_counter() - t0)
        dt = (min(tNs) - min(t2s)) / (1 if args.small else 30)
        print(f"# {label:13s} {dt * 1e6:8.1f} us/frame  "
              f"{dt / n * 1e9:5.2f} ns/lane", flush=True)
        return dt

    res = {}
    # equality check first: split must be bit-identical
    a = np.asarray(runs(disp_d, split=False))
    b = np.asarray(runs(disp_d, split=True))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(srt(disp_d, split=False))
    d = np.asarray(srt(disp_d, split=True))
    np.testing.assert_array_equal(c, d)
    np.testing.assert_array_equal(a, c)  # runs contract == sorted result

    for label, fn, vid in (
        ("runs_fused", lambda d: runs(d, split=False), True),
        ("runs_split", lambda d: runs(d, split=True), True),
        ("sorted_fused", lambda d: srt(d, split=False), True),
        ("sorted_split", lambda d: srt(d, split=True), True),
        ("bare_set", bare, False),
    ):
        res[label + "_us"] = round(timed(label, fn, vid) * 1e6, 1)

    res["metric"] = "scatter_variants_us_per_frame"
    res["n_lanes"] = n
    res["pad_shape"] = list(pad_shape)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
