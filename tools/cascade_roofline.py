#!/usr/bin/env python
"""Whole-cascade roofline: attribute the measured step to traffic,
MXU and named latency terms.

For every stage of the fused cascade this prints the modeled HBM
bytes (tpu_face/compiler/traffic.py — ideal fused-compiler traffic,
i.e. a LOWER bound), the implied bandwidth time at 819 GB/s, the MXU
time at 197 bf16 TFLOP/s, the measured in-trace stage time
(tools/tpu_trace_breakdown.py, round-4 HEAD device trace), and the
binding term.  The bottom rows give whole-step achieved GB/s against
the measured wall step — the honest utilization metric for a workload
whose stated ceiling is HBM traffic (docs/PERF.md "Whole-cascade
roofline").

Runs on CPU (pure arithmetic over the converted graphs).

    python tools/cascade_roofline.py [--batch 128] [--step-ms 17.8]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from tpu_face.compiler import Graph  # noqa: E402
from tpu_face.compiler.traffic import cascade_step_costs  # noqa: E402

DATA = Path("/root/repo/tpu_face/data")
HBM_GBS = 819.0
MXU_TFLOPS = 197.0

# measured in-trace device-op stage times at batch 128, 540p, coverage
# profile (tools/tpu_trace_breakdown.py, round-4 HEAD — identical to
# round 3 per-stage to 0.01 ms).  detect (7.02 in the trace) is split
# CNN/warp per the standalone attribution in docs/PERF.md.
MEASURED_MS = {
    "input_read": None,        # overlapped with planes_build
    "planes_build": 1.2,
    "detect_warp": 0.92,
    "detect_cnn": 6.10,
    "nms": 0.23,
    "mesh_warp": 3.44,
    "mesh_cnn": 0.84,
    "iris_warp": 1.29,
    "iris_cnn": 3.21,
    "project": None,           # fused into mesh/iris stages
}

# the named non-traffic, non-MXU term per stage (what the residual IS,
# from the probes that established it)
RESIDUAL = {
    "detect_cnn": "at traffic bound (87%)",
    "mesh_cnn": "beats bound (VMEM-resident acts)",
    "iris_cnn": "latency: 55 tiny serial convs",
    "mesh_warp": "VPU y-reduce + per-block fixed",
    "iris_warp": "per-block fixed (small blocks)",
    "detect_warp": "model loose: t1/plane reuse",
    "planes_build": "pad+convert layout op",
    "nms": "serial scan latency",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--step-ms", type=float, default=17.8,
                    help="measured wall step at this batch (bench.py)")
    ap.add_argument("--size", default="540x360")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))
    B = args.batch

    det = Graph(DATA / "face_detection_back.npz")
    mesh = Graph(DATA / "face_landmark.npz")
    iris = Graph(DATA / "iris_landmark.npz")
    costs = cascade_step_costs((w, h), B, det, mesh, iris)

    print(f"batch {B} @ {w}x{h}; ideal-fusion model; "
          f"v5e {HBM_GBS:.0f} GB/s, {MXU_TFLOPS:.0f} bf16 TFLOP/s")
    print(f"{'stage':<13} {'MB':>8} {'bw ms':>6} {'mxu ms':>7} "
          f"{'meas ms':>8}  binding term")
    tot_attr = 0.0
    for name, (b, f) in costs.items():
        if name == "total":
            continue
        t_bw = b / HBM_GBS / 1e6
        t_mxu = f / MXU_TFLOPS / 1e9
        meas = MEASURED_MS.get(name)
        bound = max(t_bw, t_mxu)
        if meas is not None:
            tot_attr += meas
        note = RESIDUAL.get(name, "")
        print(f"{name:<13} {b / 1e6:8.1f} {t_bw:6.2f} {t_mxu:7.2f} "
              f"{('%8.2f' % meas) if meas is not None else '       -'}"
              f"  {note}"
              f"{' [x%.1f of bound]' % (meas / bound) if meas and bound > 0.05 else ''}")
    tb, tf = costs["total"]
    t_bw = tb / HBM_GBS / 1e6
    t_mxu = tf / MXU_TFLOPS / 1e9
    print(f"{'TOTAL':<13} {tb / 1e6:8.1f} {t_bw:6.2f} {t_mxu:7.2f} "
          f"{tot_attr:8.2f}  (traced device-op sum; wall step "
          f"{args.step_ms:.1f} ms adds scheduling gaps)")
    gbps = tb / 1e9 / (args.step_ms / 1e3)
    print(f"achieved (modeled bytes / wall step): {gbps:.0f} GB/s "
          f"= {gbps / HBM_GBS * 100:.0f}% of peak; "
          f"bytes/frame {tb / B / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
