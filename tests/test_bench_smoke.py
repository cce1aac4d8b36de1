"""Guard the official bench artifact: BENCH_SMOKE=1 must emit well-formed
incremental JSON lines (round 2 lost its driver-recorded number to a bench
that printed nothing until the very end — VERDICT r2 weak #1)."""

import json
import os
import subprocess
import sys


def test_bench_smoke_emits_incremental_json():
    env = dict(os.environ)
    env["BENCH_SMOKE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_BUDGET_S"] = "420"
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    # at least: encode, encode+decode, tracking headline, final re-emit
    assert len(lines) >= 4, proc.stdout
    records = [json.loads(l) for l in lines]
    for rec in records:
        assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
        assert rec["value"] > 0
    # the LAST line is the headline tracking metric with stage extras
    final = records[-1]
    assert final["metric"] == "tracking_fps_512x384_vitl"
    assert "extra" in final and "tracking_ms" in final["extra"]
    # every metric printed earlier is also recoverable alone — the driver
    # may capture any prefix of stdout on a stall
    metrics = [r["metric"] for r in records]
    assert "tracking_stage_encode_fps" in metrics
