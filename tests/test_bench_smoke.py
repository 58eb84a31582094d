"""Smoke-test the measurement entry points.

bench.py is the round artifact generator (ONE JSON line contract,
CLAUDE.md); a syntax or flow regression there is invisible to the
library tests until the driver capture fails.  The bench smoke runs
the real script end-to-end on CPU at a tiny configuration (slow lane
— it compiles a cascade); the roofline probe is pure arithmetic and
stays in the default lane.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _cpu_env():
    env = {k: v for k, v in os.environ.items()
           if "AXON" not in k.upper() and not k.startswith("TPU_")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    return env


@pytest.mark.slow
def test_bench_prints_one_json_line():
    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--batch", "2",
         "--iters", "1", "--warmup", "0", "--repeats", "1",
         "--skip-p50", "--no-tracking", "--no-embed", "--no-multiface",
         "--no-variants", "--no-hires", "--no-f32-control"],
        env=_cpu_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln]
    assert len(lines) == 1, r.stdout          # the ONE-line contract
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline", "gate_iou",
                "gate_dtype", "spread_pct", "hbm_gbps"):
        assert key in rec, key
    assert rec["metric"] == "cascade_fps_per_chip"
    assert rec["gate_iou"] >= 0.99


def test_roofline_probe_attributes_step():
    r = subprocess.run(
        [sys.executable, str(REPO / "tools/cascade_roofline.py")],
        env=_cpu_env(), capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TOTAL" in r.stdout and "achieved" in r.stdout
    assert "detect_cnn" in r.stdout
