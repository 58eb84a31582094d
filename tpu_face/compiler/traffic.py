"""First-order HBM traffic + MXU FLOP model of the fused cascade.

The cascade's stated performance ceiling is memory traffic, not FLOPs
(docs/PERF.md; the back CNN runs at ~87% of its fused-traffic bound
while whole-step MFU is ~2.4%).  This module makes that claim
*quantitative for the whole step*: it counts, stage by stage, the
bytes a perfectly-fusing compiler still has to move through HBM and
the MXU FLOPs of every matmul-shaped op, so achieved GB/s can sit in
the bench artifact next to MFU (``bench.py`` emits ``hbm_gbps``) and
the per-stage roofline table (tools/cascade_roofline.py,
docs/PERF.md) is derived from ONE model instead of ad-hoc arithmetic.

Counting conventions (deliberately ideal -> the numbers are *lower
bounds* on real traffic):

* CNNs: only outputs of ops a fusing compiler must materialize
  (convs/pools/resizes/concats/matmuls) count, at bf16; elementwise
  chains are free (fused into producers).  Weights count once per
  step, not per frame.  Same rule as tools/cnn_floor.py, whose
  measured validation is: back CNN 6.10 ms vs 5.70 ideal (87% — at
  the bound), mesh CNN 0.84 vs 1.08 (small nets BEAT the loose bound
  by keeping activations VMEM-resident), iris 3.21 vs 1.40
  (latency-bound across 55 tiny sequential convs).
* Pallas warps: resident tier reads the full padded plane set out of
  HBM once per warp call per frame; the strips tier reads one
  [3, band, xload] strip per output block (ops/pallas_warp.py's
  actual DMA granularity).  Outputs materialize at f32.
* The separable detection warp (ops/image.py separable_sample_planar)
  materializes its [Ho, Wp] per-channel intermediate between the two
  hat matmuls, plus the per-frame hat weight matrices.
* MXU FLOPs: 2*M*K*N per dot.  The warp kernel's per-block dot is
  [band, win] x [win, rt*cw] per channel (pallas_warp._block_dot), so
  a full warp is 2*band*win*out_h*out_w*3 regardless of tiling — the
  rt-invariance noted in docs/PERF.md.  The kernel's VPU hat-build
  and y-reduction are NOT counted (they are the model's named
  residual, not MXU work).

Reference basis: the reference has no analog (single-threaded TFLite
CPU); this quantifies the TPU design's own headroom story.
"""

from __future__ import annotations

import numpy as np

from .lowering import Graph

# ops whose outputs a fusing compiler still has to materialize
MATERIALIZE_OPS = {"CONV_2D", "DEPTHWISE_CONV_2D", "MAX_POOL_2D",
                   "AVERAGE_POOL_2D", "RESIZE_BILINEAR",
                   "DEPTH_TO_SPACE", "CONCATENATION", "FULLY_CONNECTED",
                   "MEAN", "BATCH_MATMUL"}


def graph_traffic(graph: Graph, act_bytes: int = 2):
    """Per-frame activation bytes + per-step weight bytes of one CNN.

    Returns ``(ideal_acts, naive_acts, weight_bytes)``: *ideal* counts
    only materialized-op inputs/outputs (fused elementwise is free),
    *naive* counts every op's activations — both PER FRAME, weights
    once.  (tools/cnn_floor.py's model, factored here so bench.py and
    the roofline probe share one definition.)"""
    shapes = {i: t["shape"] for i, t in enumerate(graph.tensors)}

    def nbytes(tid):
        s = shapes[tid]
        return int(np.prod([d if d > 0 else 1 for d in s])) * act_bytes

    ideal = naive = weight = 0
    for node in graph.ops:
        op, ins, outs = node["op"], node["inputs"], node["outputs"]
        acts_in = sum(nbytes(i) for i in ins if i not in graph.consts)
        weight += sum(graph.consts[i].nbytes for i in ins
                      if i in graph.consts)
        out_b = sum(nbytes(o) for o in outs)
        naive += acts_in + out_b
        if op in MATERIALIZE_OPS:
            ideal += acts_in + out_b
    return ideal, naive, weight


def _warp_geometry(image_size):
    """(hp, wp, plane_bytes, resident, bands, warp_cfg) for a frame
    size — thin wrappers over the pipeline's single-source config
    methods so this model can never drift from the real dispatch."""
    import jax.numpy as jnp

    from ..ops.pallas_warp import padded_width, plane_y_align, \
        planes_fit_vmem
    from ..pipeline import _DetectorBase

    w, h = image_size
    resident = planes_fit_vmem(h, w)
    plane_bytes = 4 if resident else 2       # f32 resident, bf16 strips
    y_align = plane_y_align(jnp.float32 if resident else jnp.bfloat16)
    bands = _DetectorBase._bands(image_size)
    hp = max(-(-h // y_align) * y_align,
             -(-max(bands) // y_align) * y_align)
    wp = padded_width(w)
    # _warp_cfg without an instance: replicate its static tiers
    if max(image_size) > 2560:
        xload = min(512, padded_width(w))
        cfg = (16, xload, xload - 129, 8)
    else:
        cfg = (32, 256, 126, 16)
    return hp, wp, plane_bytes, resident, bands, cfg


def _pallas_warp_cost(out_h, out_w, n_targets, band, hp, wp,
                      plane_bytes, resident, cw, rt, xload):
    """(hbm_bytes, mxu_flops) per frame of one fused warp call
    covering ``n_targets`` same-size output grids."""
    win = 128 if resident else xload
    out_bytes = n_targets * out_h * out_w * 3 * 4
    if resident:
        read = 3 * hp * wp * plane_bytes          # one VMEM fetch
    else:
        blocks = n_targets * -(-out_h // rt) * -(-out_w // cw)
        read = blocks * 3 * band * xload * plane_bytes
    flops = n_targets * 2 * band * win * out_h * out_w * 3
    return read + out_bytes, flops


def cascade_step_costs(image_size, batch, det_graph: Graph,
                       mesh_graph: Graph, iris_graph: Graph,
                       act_bytes: int = 2):
    """Modeled per-STEP HBM bytes and MXU FLOPs of the fused cascade.

    Returns ``{stage: (bytes, flops)}`` plus a ``"total"`` row.  One
    face per frame (the bench configuration); K-face pipelines scale
    the mesh/iris rows by K."""
    w, h = image_size
    hp, wp, pb, resident, (mesh_band, iris_band), cfg = \
        _warp_geometry(image_size)
    cw, xload, _x_budget, rt = cfg
    _, det_in_h, det_in_w, _ = det_graph.input_shape
    _, mesh_h, mesh_w, _ = mesh_graph.input_shape
    _, iris_h, iris_w, _ = iris_graph.input_shape
    n_anchors = 2304 if det_in_h == 192 else 896

    costs = {}

    # frame ingest + shared plane build (pipeline._prepare_frame):
    # read the uint8 frame, write the padded channel planes
    costs["input_read"] = (batch * h * w * 3, 0)
    costs["planes_build"] = (batch * 3 * hp * wp * pb, 0)

    # detection warp: separable hat matmuls over the planes
    # (image.separable_sample_planar) — planes read, [Ho, Wp]
    # per-channel intermediate written + re-read, hats written, output
    t1_bytes = 4 if max(image_size) <= 720 else act_bytes
    det_warp_b = (3 * hp * wp * pb                    # planes read
                  + 2 * 3 * det_in_h * wp * t1_bytes  # t1 write+read
                  + det_in_h * hp * 4 + det_in_w * wp * 4   # hats
                  + det_in_h * det_in_w * 3 * 4)      # output
    det_warp_f = 3 * (2 * det_in_h * hp * wp
                      + 2 * det_in_h * wp * det_in_w)
    costs["detect_warp"] = (batch * det_warp_b, batch * det_warp_f)

    for name, g, mul in (("detect_cnn", det_graph, 1),
                         ("mesh_cnn", mesh_graph, 1),
                         ("iris_cnn", iris_graph, 2)):
        ideal, _naive, weight = graph_traffic(g, act_bytes)
        from .lowering import graph_flops
        costs[name] = (batch * ideal * mul + weight,
                       batch * graph_flops(g) * mul)

    # NMS + box decode (ops/postprocess.py): anchors/boxes/scores per
    # frame — decoded boxes [N,16] f32 written+read by the scan, the
    # score/validity vectors, plus the anchor table once
    nms_b = batch * (3 * n_anchors * 16 * 4 + 4 * n_anchors * 4) \
        + n_anchors * 4 * 4
    costs["nms"] = (nms_b, 0)

    mb, mf = _pallas_warp_cost(mesh_h, mesh_w, 1, mesh_band, hp, wp,
                               pb, resident, cw, rt, xload)
    costs["mesh_warp"] = (batch * mb, batch * mf)
    ib, if_ = _pallas_warp_cost(iris_h, iris_w, 2, iris_band, hp, wp,
                                pb, resident, cw, rt, xload)
    costs["iris_warp"] = (batch * ib, batch * if_)

    # landmark projection + result assembly: 468*3 + iris rows, f32
    costs["project"] = (batch * (468 * 3 + 2 * 76 * 3) * 4 * 3, 0)

    costs["total"] = (sum(b for b, _ in costs.values()),
                      sum(f for _, f in costs.values()))
    return costs


def cascade_bytes_per_frame(image_size, batch, det_graph, mesh_graph,
                            iris_graph):
    """Modeled HBM bytes per frame (total row / batch) — the number
    bench.py multiplies by measured fps for ``hbm_gbps``."""
    total_b, _ = cascade_step_costs(image_size, batch, det_graph,
                                    mesh_graph, iris_graph)["total"]
    return total_b / batch
