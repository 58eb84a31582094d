"""Pin the whole-cascade traffic/FLOP model (compiler/traffic.py).

bench.py's ``hbm_gbps`` and the docs/PERF.md roofline both derive from
this model; these tests pin its structure and the 540p/batch-128
reference values so a refactor cannot silently change what the
recorded bandwidth number MEANS.  (The model is analytic — no TPU.)
"""

from pathlib import Path

import pytest

from tpu_face.compiler import Graph
from tpu_face.compiler.traffic import (cascade_bytes_per_frame,
                                       cascade_step_costs,
                                       graph_traffic)

DATA = Path(__file__).resolve().parents[1] / "tpu_face/data"


@pytest.fixture(scope="module")
def graphs():
    return (Graph(DATA / "face_detection_back.npz"),
            Graph(DATA / "face_landmark.npz"),
            Graph(DATA / "iris_landmark.npz"))


def test_graph_traffic_back_cnn(graphs):
    """The back CNN's ideal fused traffic at batch 128 is the pinned
    4,666 MB (87% of which the measured 6.10 ms stage achieves —
    tools/cnn_floor.py); naive > ideal > weights always."""
    det, _, _ = graphs
    ideal, naive, weight = graph_traffic(det)
    assert naive > ideal > 0 and weight > 0
    total = ideal * 128 + weight
    assert abs(total / 1e6 - 4666.3) < 5.0, total / 1e6


def test_cascade_costs_structure(graphs):
    """Every stage the roofline table names is present, bytes/flops
    non-negative, and the total row is the sum of the stages."""
    det, mesh, iris = graphs
    costs = cascade_step_costs((540, 360), 128, det, mesh, iris)
    expected = {"input_read", "planes_build", "detect_warp",
                "detect_cnn", "nms", "mesh_warp", "mesh_cnn",
                "iris_warp", "iris_cnn", "project", "total"}
    assert set(costs) == expected
    tb, tf = costs.pop("total")
    assert tb == sum(b for b, _ in costs.values())
    assert tf == sum(f for _, f in costs.values())
    assert all(b >= 0 and f >= 0 for b, f in costs.values())
    # CNN traffic dominates at 540p (the "bandwidth-bound by design"
    # shape): detect_cnn alone is > 40% of all bytes
    assert costs["detect_cnn"][0] > 0.4 * tb


def test_bytes_per_frame_pinned(graphs):
    """The 540p/batch-128 bytes-per-frame behind the bench artifact's
    hbm_gbps: pinned at 70.4 MB (±0.5) — change this number ONLY
    with a matching docs/PERF.md roofline update."""
    det, mesh, iris = graphs
    bpf = cascade_bytes_per_frame((540, 360), 128, det, mesh, iris)
    assert abs(bpf / 1e6 - 70.4) < 0.5, bpf / 1e6


def test_strips_tier_counts_block_strips(graphs):
    """At 1080p (strips residency) the warp terms must switch from
    whole-plane reads to per-block strip DMA accounting: iris warp
    bytes grow ~linearly with block count, not plane size, and the
    planes build switches to bf16 (2-byte) planes."""
    det, mesh, iris = graphs
    c540 = cascade_step_costs((540, 360), 1, det, mesh, iris)
    c1080 = cascade_step_costs((1920, 1080), 1, det, mesh, iris)
    # bf16 planes at 1080p: build bytes = 3*hp*wp*2 (hp 1088, wp 1920)
    assert c1080["planes_build"][0] == 3 * 1088 * 1920 * 2
    # resident 540p reads the whole f32 plane set per warp call
    assert c540["mesh_warp"][0] > 3 * 360 * 640 * 4
    # strips iris warp: 2 eyes x (64/16 rows x 64/32 cols) blocks of
    # [3, 144, 256] bf16 strips + outputs — block-count accounting
    blocks = 2 * (64 // 16) * (64 // 32)
    strips = blocks * 3 * 144 * 256 * 2
    outs = 2 * 64 * 64 * 3 * 4
    assert c1080["iris_warp"][0] == strips + outs
