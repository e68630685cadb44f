"""Smoke tests for the eval/ measurement tooling.

The perf-measurement scripts (stage-budget tracer, geometry bench,
scatter variant sweep) are run on the real TPU by hand, so nothing else
exercises them in CI; these subprocess smokes keep them importable,
runnable end-to-end on CPU, and emitting their one-line JSON contract.
They check FLOW, not numbers -- CPU timings are meaningless and the
tracer matches no TPU ops on the CPU backend.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_json(args, timeout=540):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # the virtual 8-device mesh is pointless here and slows compiles
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True,
    )
    assert out.returncode == 0, f"{args}:\n{out.stdout}\n{out.stderr}"
    last = out.stdout.strip().splitlines()[-1]
    return json.loads(last)


def test_profile_trace_smoke():
    res = _run_json(
        ["eval/profile_trace.py", "--geometry", "demo", "--frames", "2"]
    )
    assert res["metric"] == "device_stage_budget_us_per_frame"
    assert res["surface"] == "stream"
    # CPU backend: no TPU pids in the trace, so nothing buckets -- the
    # classifier must say so rather than publish a fake budget
    assert res["classification_ok"] is False
    assert set(res["significant_ops_per_frame"]) == {
        "event_kernel", "scatter", "tail_kernel", "other"
    }


def test_bench_geometry_smoke():
    res = _run_json([
        "eval/bench_geometry.py", "--geometry", "demo", "--frames", "2",
        "--events", "4096", "--rounds", "1", "3",
    ])
    assert res["geometry"] == "demo"
    assert res["frame_ms"] > 0
    assert res["events_per_frame"] > 0
    assert res["rect"] == [1320, 1760]


def test_bench_scatter_variants_smoke():
    res = _run_json(["eval/bench_scatter_variants.py", "--small"])
    assert res["metric"] == "scatter_variants_us_per_frame"
    for k in ("runs_fused_us", "runs_split_us", "sorted_fused_us",
              "sorted_split_us", "bare_set_us"):
        assert res[k] > 0, k
