#!/usr/bin/env python
"""HBM-traffic floor for the cascade CNNs: is XLA's measured stage
time at the bandwidth bound, or is there headroom?

For each net: FLOPs, an IDEAL activation-traffic bound (only
conv/pool/resize/concat outputs materialize; elementwise chains fuse
into their producers) and a NAIVE bound (every op materializes).
Implied ms/step at 819 GB/s (v5e) is printed next to the measured
stage times from docs/PERF.md for comparison.  Runs on CPU.

    python tools/cnn_floor.py [--batch 128]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from tpu_face.compiler.lowering import Graph, graph_flops  # noqa: E402
from tpu_face.compiler.traffic import graph_traffic  # noqa: E402

DATA = Path("/root/repo/tpu_face/data")
HBM_GBS = 819.0


def traffic(graph, batch, act_bytes=2):
    # single source of truth: tpu_face/compiler/traffic.py (the
    # whole-cascade roofline shares this per-net model)
    ideal, naive, weight_bytes = graph_traffic(graph, act_bytes)
    return ideal * batch + weight_bytes, naive * batch + weight_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    B = args.batch

    # measured in-trace stage times at batch 128, round-3 HEAD
    # (tools/tpu_trace_breakdown.py, coverage profile; iris covers
    # BOTH eyes = effective batch 2B).  NOTE the mesh CNN (0.84 ms)
    # BEATS its "ideal" bound (1.08 ms): small nets keep activations
    # VMEM-resident across ops, so these bounds are loose upper
    # traffic estimates, not tight floors — a stage near or below its
    # bound is XLA/latency-bound, not bandwidth-limited.
    measured = {"face_detection_back": (6.1, 1),
                "face_landmark": (0.84, 1),
                "iris_landmark": (3.21, 2)}
    print(f"batch {B}; bf16 activations; v5e {HBM_GBS:.0f} GB/s, "
          f"197 bf16 TFLOP/s")
    for name, (meas, mul) in measured.items():
        g = Graph(DATA / f"{name}.npz")
        fl = graph_flops(g, B) * mul
        ideal, naive = traffic(g, B)
        ideal, naive = ideal * mul, naive * mul
        t_bw_i = ideal / HBM_GBS / 1e6
        t_bw_n = naive / HBM_GBS / 1e6
        t_mxu = fl / 197e12 * 1e3
        print(f"{name:24s} flops {fl / 1e9:6.1f} G  "
              f"ideal {ideal / 1e6:7.1f} MB -> {t_bw_i:5.2f} ms  "
              f"naive {naive / 1e6:7.1f} MB -> {t_bw_n:5.2f} ms  "
              f"mxu {t_mxu:5.2f} ms  measured {meas:5.2f} ms")


if __name__ == "__main__":
    main()
