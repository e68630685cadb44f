"""Per-op device-trace attribution of the ESL-init scan program.

Answers: of the ~12 ms/scan (ESL_INIT_r05.json), how much is the Pallas
binary-search kernel vs the XLA prep scans (cummin/cummax/cumsum +
flips build G/F/N/R/C over the padded footprint) vs the two remaps?
Decides where the next optimization lever is.  Prints ONE JSON line.
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from xmaps_tpu.utils.jaxenv import respect_jax_platforms

    respect_jax_platforms()
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/xmaps_tpu/jax_cache"),
    )
    import dataclasses

    from xmaps_tpu.apps.eval_esl import build_device_depth_init
    from xmaps_tpu.calib.maps import CalibrationParams, CamProjMaps
    from xmaps_tpu.ops.pallas_esl import rows_monotone

    calib = CalibrationParams.from_yaml(
        "/root/reference/data/ESL_calib_hhi.yaml", 640, 480, 1080, 1920
    )
    calib = dataclasses.replace(
        calib, rect_image_width=3 * 1080, rect_image_height=3 * 1920
    )
    maps = CamProjMaps.build_cached(
        calib, zero_undistort_proj_map=True,
        cache_dir=os.path.expanduser("~/.cache/xmaps_tpu"),
    )
    proj_rect = maps.build_rectified_time_map(
        scan_upwards=False, border_replicate=False
    )
    assert rows_monotone(proj_rect)
    p03 = float(maps.P2[0, 3])
    cropped_init = build_device_depth_init(maps, calib, proj_rect, p03)
    impl, bound = cropped_init.impl, cropped_init.bound

    rng = np.random.default_rng(3)
    cam = np.where(
        rng.random((480, 640)) < 0.85, rng.random((480, 640)), 0
    ).astype(np.float32)
    cam_d = jax.device_put(cam)
    jax.block_until_ready(jax.device_put(np.zeros(32 << 20, np.uint8)))

    reps = 4

    @jax.jit
    def group(c, bound):
        acc = jnp.float32(0)
        for i in range(reps):
            disp, depth = impl(c + jnp.float32(i) * 1e-7, *bound)
            acc = acc + depth[0, 0] + disp[7, 7]
        return acc

    print("# compiling...", flush=True)
    float(group(cam_d, bound))

    trace_dir = "/tmp/xmaps_esl_trace"
    os.system(f"rm -rf {trace_dir}")
    runs = 3
    with jax.profiler.trace(trace_dir):
        for _ in range(runs):
            float(group(cam_d, bound))

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

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
    if not device_pids:
        device_pids = {
            p for p, n in pid_names.items() if "/device" in n.lower()
        }

    scans = runs * reps
    by_base = defaultdict(float)
    base_cnt = defaultdict(int)
    long_by_base = {}
    module_us = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        tname = tid_names[ev["pid"]].get(ev["tid"], "")
        if "Module" in tname:
            module_us += ev.get("dur", 0.0)
            continue
        if "Ops" not in tname:
            continue
        base = re.sub(r"\.\d+$", "", ev.get("name", ""))
        by_base[base] += ev.get("dur", 0.0)
        base_cnt[base] += 1
        long_by_base.setdefault(
            base, str(ev.get("args", {}).get("long_name", ""))[:160]
        )

    total = sum(by_base.values())
    print(f"# module: {module_us / scans / 1e3:.2f} ms/scan; "
          f"ops total: {total / scans / 1e3:.2f} ms/scan")
    print("# top ops:")
    top = sorted(by_base.items(), key=lambda kv: -kv[1])[:18]
    for base, dur in top:
        print(f"{dur / scans / 1e3:8.3f} ms/scan  x{base_cnt[base]:5d}  "
              f"{base[:70]}")
        print(f"          {long_by_base[base]}")
    print(json.dumps({
        "metric": "esl_init_op_attribution_ms_per_scan",
        "module_ms": round(module_us / scans / 1e3, 3),
        "ops_total_ms": round(total / scans / 1e3, 3),
        "top": {
            b: round(d / scans / 1e3, 3) for b, d in top[:12]
        },
    }))


if __name__ == "__main__":
    main()
